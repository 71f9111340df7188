"""The LINR-PCGC occupancy-prediction network, TPU-native.

Functionally equivalent to the reference model (LINR_PCGC_Model + CNP +
InceptionResNet; /root/reference/models/model_core.py:19-81,
upsample.py:37-217, resnet.py:7-60) but architected for XLA instead of a
sparse-tensor engine:

  * Every tensor at a scale lives on ONE fixed, canonically sorted
    coordinate set (with the default ``instage=1`` the reference's masking /
    pruning machinery is the identity, and ``ConvWithPrune`` forces output
    coords = parent coords), so every 3x3x3 "sparse convolution" here is a
    27-neighbor gather + a dense (N, 27*Cin) x (27*Cin, Cout) matmul driven
    by a precomputed neighbor-index map.  1x1x1 convolutions are plain
    matmuls.  The gather map is built once per (frame, scale) and shared by
    all ~36 convolutions of the forward pass.

  * The per-scale input MLP (scale embedding ++ 7-bit neighbor-occupancy
    feature -> 8 channels; model_core.py:31-34,46-57) has only 128 possible
    inputs per scale, so it is evaluated as a (S, 128, 8) lookup table
    rebuilt from the parameters each step; gradients flow through the table
    construction.  A per-node row gather replaces N MLP evaluations.

  * All scales of a frame are processed as one flat node array (the CNP
    weights are scale-shared), so training runs ONE fused XLA program per
    frame regardless of scale count.

  * The production codec path is stage-staged (`level_context` +
    `stage_logits`): encoder and decoder run the *same* jitted executables
    on the same padded shapes, which makes the probability streams
    bit-identical on both sides by construction — the property the
    reference gets from running the identical CUDA graph twice
    (SURVEY.md section 7.3).

Stage semantics (outstage=8, instage=1): stage i predicts P(octant-i child
exists) for every parent from a context that is the sum of a global feature
(block_in over the input embedding) and an occupancy-context block over the
already-known occupancy channels 0..i-1 (upsample.py:183-214).

Parameters are plain nested dicts of float32 arrays (no flax module state):
the checkpoint *is* part of the bitstream, so a transparent, deterministic
flattening order (sorted tree paths) is part of the format definition.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
LN2 = math.log(2.0)

# Octant-bit stage groupings (get_stage_lst, upsample.py:24-35): stage g
# predicts its group's bits at once (conditionally independent given the
# context); the context for stage g+1 sees the bits of groups 0..g as
# channels, in group-concatenation order.
STAGE_GROUPS = {
    8: tuple((o,) for o in range(8)),
    4: ((0, 1), (2, 3), (4, 5), (6, 7)),
    3: ((0, 1), (6, 7), (2, 3, 4, 5)),
    2: ((0, 1, 6, 7), (2, 3, 4, 5)),
    1: (tuple(range(8)),),
}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyper-parameters; defaults match the reference CLI defaults
    (main.py:97,218,518-522)."""

    scale_num: int = 7
    in_channel: int = 7          # 7-neighbor occupancy feature
    hidden_channel_conv: int = 8
    hidden_channel_mlp: int = 24
    embed_dim: int = 8
    scale_mlp_hidden: int = 16
    block_layers: int = 1
    outstage: int = 8
    instage: int = 1
    kernel_size: int = 3  # model_core2 variant: plumb k through every block
    # Residual-core type inside blocks (resnet.py:146-162 ResNetBlock).
    # The reference CLI can only ever produce 'inception' (CNP never passes
    # block_type); 'resnet' (resnet.py:63-94) and 'dilation'
    # (DilatedResNet, resnet.py:97-143) are supported because the classes
    # exist upstream.  'dilation' runs on the flat gather backend only
    # (its d=2 convs need a second neighbor map the brick layouts don't
    # carry); backend selection falls back automatically.
    block_type: str = "inception"

    def __post_init__(self):
        if self.block_layers < 1:
            raise ValueError(f"block_layers must be >= 1, got {self.block_layers}")
        if self.outstage not in STAGE_GROUPS:
            raise ValueError(
                f"outstage={self.outstage}: the reference supports "
                f"{sorted(STAGE_GROUPS)} (get_stage_lst, upsample.py:24-35)"
            )
        if self.instage != 1:
            # instage > 1 splits PARENT nodes spatially by octant parity
            # and conditions later parent groups on earlier ones
            # (upsample.py:99-109 split_mask, 136-160 basic_module).  The
            # reference hardcodes instage=1 at both model construction
            # sites (main.py:97,218); fail loudly rather than silently
            # train a different network.
            raise NotImplementedError(
                f"instage={self.instage}: only instage=1 (the value the "
                "reference ever constructs, main.py:97,218) is implemented"
            )
        if self.block_type not in ("inception", "resnet", "dilation"):
            raise ValueError(f"unknown block_type {self.block_type!r}")

    @property
    def dilations(self) -> tuple:
        """Dilations whose neighbor maps the model's convs gather over;
        callers stack the maps along the K axis of ``idx_t``
        ((D*kvol, N), dilation-1 first — _conv3 slices by kernel
        volume, _dilated_core picks its own blocks)."""
        return DILATION_LIST if self.block_type == "dilation" else (1,)

    @property
    def ch(self) -> int:
        return self.hidden_channel_conv

    @property
    def kvol(self) -> int:
        return self.kernel_size**3

    # ---- stage-grouping geometry (get_stage_lst, upsample.py:24-35) ----

    @property
    def groups(self) -> tuple:
        """Octant indices predicted by each stage."""
        return STAGE_GROUPS[self.outstage]

    @property
    def group_perm(self) -> tuple:
        """Octant order as the context channels see it: groups
        concatenated (e.g. outstage=3 -> 0,1,6,7,2,3,4,5 — the reference
        merges per-GROUP occupancy tensors channel-wise,
        merge_two_frames/upsample.py:206-210)."""
        return tuple(o for g in self.groups for o in g)

    @property
    def cum_group(self) -> tuple:
        """cum_group[g] = #context channels available AFTER stage g."""
        out, c = [], 0
        for g in self.groups:
            c += len(g)
            out.append(c)
        return tuple(out)

    @property
    def ctx_channels(self) -> int:
        """Context-channel count of the LAST stage (the widest context
        block input; = 7 at outstage=8)."""
        return 8 - len(self.groups[-1])

    @property
    def gmax(self) -> int:
        """Widest stage (bits predicted at once; 1 at outstage=8)."""
        return max(len(g) for g in self.groups)


# ------------------------------------------------------------------ init --


def _linear_init(key, din, dout):
    """Torch nn.Linear + xavier_uniform(gain=relu) + zero bias
    (module_utils.py:42-56)."""
    gain = math.sqrt(2.0)
    bound = gain * math.sqrt(6.0 / (din + dout))
    w = jax.random.uniform(key, (din, dout), F32, -bound, bound)
    return {"w": w, "b": jnp.zeros((dout,), F32)}


def _conv_init(key, kvol, cin, cout):
    """MinkowskiConvolution default init: U(-s, s), s = 1/sqrt(cin*kvol),
    for both kernel and bias."""
    s = 1.0 / math.sqrt(cin * kvol)
    kw, kb = jax.random.split(key)
    shape = (kvol, cin, cout) if kvol > 1 else (cin, cout)
    return {
        "w": jax.random.uniform(kw, shape, F32, -s, s),
        "b": jax.random.uniform(kb, (cout,), F32, -s, s),
    }


def _irn_init(key, ch, kvol=27):
    """InceptionResNet block (resnet.py:7-60): two paths, channels halved."""
    h = ch // 2
    ks = jax.random.split(key, 5)
    return {
        "c00": _conv_init(ks[0], kvol, ch, h),
        "c01": _conv_init(ks[1], kvol, h, h),
        "c10": _conv_init(ks[2], 1, ch, h),
        "c11": _conv_init(ks[3], kvol, h, h),
        "c12": _conv_init(ks[4], 1, h, h),
    }


def _resnet_init(key, ch, kvol=27):
    """Plain residual block (resnet.py:63-94): conv3 -> relu -> conv3 + x."""
    k0, k1 = jax.random.split(key)
    return {
        "r0": _conv_init(k0, kvol, ch, ch),
        "r1": _conv_init(k1, kvol, ch, ch),
    }


# DilatedResNet's dilation_list (resnet.py:102): [1,2,3,5,7,11][:dilation]
# with dilation=2 always — ResNetBlock (resnet.py:146-153) constructs the
# core as Net(channels, kernel_size, dimension) and never passes dilation.
DILATION_LIST = (1, 2)


def _dilated_init(key, ch, kvol=27):
    """DilatedResNet (resnet.py:97-143): two banks of per-dilation k^3
    convs, each concatenated then mixed by a 1x1; residual add."""
    nd = len(DILATION_LIST)
    ks = jax.random.split(key, 2 * nd + 2)
    return {
        "dc0": tuple(_conv_init(ks[i], kvol, ch, ch) for i in range(nd)),
        "dl0": _conv_init(ks[nd], 1, ch * nd, ch),
        "dc1": tuple(
            _conv_init(ks[nd + 1 + i], kvol, ch, ch) for i in range(nd)
        ),
        "dl1": _conv_init(ks[2 * nd + 1], 1, ch * nd, ch),
    }


def _block_init(key, cin, ch, cout, kvol=27, layers=1, block_type="inception"):
    """make_block (upsample.py:88-97): conv -> relu -> ResNetBlock -> conv.

    ResNetBlock (resnet.py:146-162) stacks ``layers`` residual cores and
    adds an extra outer skip when layers > 1.  The single-inception case
    keeps the flat {conv_in, irn, conv_out} parameter layout (the weight
    bitstream's flattening order for the default config); the general case
    stores the stack under "core"."""
    k0, k1, k2 = jax.random.split(key, 3)
    core_init = {
        "inception": _irn_init,
        "resnet": _resnet_init,
        "dilation": _dilated_init,
    }[block_type]
    if layers == 1 and block_type == "inception":
        core = {"irn": _irn_init(k1, ch, kvol)}
    else:
        core = {
            "core": tuple(
                core_init(k, ch, kvol) for k in jax.random.split(k1, layers)
            )
        }
    return {
        "conv_in": _conv_init(k0, kvol, cin, ch),
        **core,
        "conv_out": _conv_init(k2, kvol, ch, cout),
    }


def init_params(key, cfg: ModelConfig):
    S, ch, emb = cfg.scale_num, cfg.ch, cfg.embed_dim
    keys = jax.random.split(key, 8)

    def stack_init(k, fn, n):
        return jax.vmap(fn)(jax.random.split(k, n))

    scale_mlp = {
        "l0": stack_init(
            keys[1],
            lambda k: _linear_init(k, emb + cfg.in_channel, cfg.scale_mlp_hidden),
            S,
        ),
        "l1": stack_init(
            keys[2], lambda k: _linear_init(k, cfg.scale_mlp_hidden, ch), S
        ),
    }
    prune = stack_init(
        keys[4], lambda k: _conv_init(k, cfg.kvol, ch, ch), cfg.outstage
    )
    # per-stage heads: l1 out-width = the stage's group size (1 at the
    # default outstage=8, where the stacked layout is kept for weight-
    # bitstream stability; ragged groupings store a per-stage tuple so the
    # serialized parameter count matches the reference exactly)
    l1_keys = jax.random.split(keys[6], cfg.outstage)
    if cfg.gmax == 1:
        l1 = stack_init(
            keys[6], lambda k: _linear_init(k, cfg.hidden_channel_mlp, 1), cfg.outstage
        )
    else:
        l1 = tuple(
            _linear_init(l1_keys[g], cfg.hidden_channel_mlp, len(grp))
            for g, grp in enumerate(cfg.groups)
        )
    inner_mlp = {
        "l0": stack_init(
            keys[5], lambda k: _linear_init(k, ch, cfg.hidden_channel_mlp), cfg.outstage
        ),
        "l1": l1,
    }
    outer_keys = jax.random.split(keys[7], max(cfg.outstage - 1, 1))
    # context block g's conv_in reads the bits of groups 0..g
    # (cum_channels, upsample.py:46-47,72-76); = g+1 at outstage=8
    outer = [
        _block_init(outer_keys[i], cfg.cum_group[i], ch, ch, cfg.kvol)
        for i in range(cfg.outstage - 1)
    ]
    return {
        "scale_emb": jax.random.normal(keys[0], (S, emb), F32),  # torch default
        "scale_mlp": scale_mlp,
        # block_layers / block_type apply to block_in only: the reference's
        # CNP passes block_layers just there (upsample.py:43) while outer /
        # prune-path blocks hardcode 1-layer inception (upsample.py:60,74)
        "block_in": _block_init(
            keys[3], ch, ch, ch, cfg.kvol, cfg.block_layers, cfg.block_type
        ),
        "prune": prune,
        "inner_mlp": inner_mlp,
        "outer": outer,
    }


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def flatten_params(params) -> jnp.ndarray:
    """Deterministic 1-D view of all parameters (sorted tree-path order).

    This order is part of the weight-bitstream format: the quantized model
    is serialized/deserialized through it (cf. the reference's
    torch-parameters() flattening, model_size_est.py:391).
    """
    leaves = jax.tree_util.tree_leaves(params)  # deterministic key order
    return jnp.concatenate([leaf.reshape(-1) for leaf in leaves])


def unflatten_params(params_like, flat):
    leaves, treedef = jax.tree_util.tree_flatten(params_like)
    out, pos = [], 0
    for leaf in leaves:
        n = int(np.prod(leaf.shape))
        out.append(jnp.asarray(flat[pos: pos + n], F32).reshape(leaf.shape))
        pos += n
    assert pos == len(flat), (pos, len(flat))
    return jax.tree_util.tree_unflatten(treedef, out)


# --------------------------------------------------------------- applies --


# TPU layout note: every activation in this network has <= 24 channels,
# and TPU tiles pad the minor (lane) dimension to 128.  Node-major (N, C)
# arrays therefore waste up to 16x memory and bandwidth (measured: an
# 8-channel gather temp expanded 523 MB -> 8.2 GB).  All internal compute
# is feature-major (C, N): the huge N axis rides the lanes, channels ride
# the sublanes, and padding disappears.  Neighbor maps are carried
# transposed as (K, N) for the same reason.  Public entry points document
# their layouts explicitly.


def _relu(x):
    return jnp.maximum(x, 0.0)


# Full-f32 matmuls: on TPU the default precision is bf16 inputs, which is
# too coarse for probability modelling at 54k parameters (and the channel
# counts are tiny, so the extra MXU passes are cheap next to the gathers).
_PREC = jax.lax.Precision.HIGHEST


def _conv1(x, p):
    """1x1x1 conv, feature-major: (Cin, N) -> (Cout, N)."""
    y = jax.lax.dot_general(
        p["w"], x, (((0,), (0,)), ((), ())),
        precision=_PREC, preferred_element_type=F32,
    )
    return y + p["b"][:, None]


def _gather_nbrs(x, idx_t):
    """(Cin, N) x (K, N) -> (Cin, K, N) with zeros for absent rows."""
    cin, n = x.shape
    k = idx_t.shape[0]
    # -1 marks an absent neighbor; JAX wraps negative indices even in fill
    # mode, so remap to n (out of bounds high) which fill-gathers zeros.
    idx = jnp.where(idx_t < 0, n, idx_t).reshape(-1)
    g = jnp.take(x, idx, axis=1, mode="fill", fill_value=0.0)
    return g.reshape(cin, k, n)


def _conv3_apply(x, w, idx_t):
    g = _gather_nbrs(x, idx_t)
    return jax.lax.dot_general(
        w, g, (((0, 1), (1, 0)), ((), ())),
        precision=_PREC, preferred_element_type=F32,
    )


@jax.custom_vjp
def _conv3_op(x, w, idx_t):
    return _conv3_apply(x, w, idx_t)


def _conv3_op_fwd(x, w, idx_t):
    return _conv3_apply(x, w, idx_t), (x, w, idx_t)


def _conv3_op_bwd(res, dy):
    """Scatter-free backward.

    Autodiff would differentiate the forward gather into a scatter-add
    along the lane dimension — the slowest memory op on TPU.  But the
    neighborhood relation is symmetric: node n has neighbor j at offset k
    iff j has neighbor n at offset -k, and our lexicographic offset table
    satisfies offsets[K-1-k] == -offsets[k].  So the input gradient is
    itself a gather-conv over the SAME index map with the kernel flipped
    along K and transposed (Cin <-> Cout):

        dx[:, j] = sum_k w[K-1-k]^T dy[:, idx[k, j]].

    (Flipping both the kernel and the map would cancel out.)
    """
    x, w, idx_t = res
    w_rev_t = jnp.flip(w, axis=0).transpose(0, 2, 1)  # (K, Cout, Cin)
    dx = _conv3_apply(dy, w_rev_t, idx_t)
    g = _gather_nbrs(x, idx_t)  # (Cin, K, N), recomputed (remat-friendly)
    dw = jax.lax.dot_general(
        g, dy, (((2,), (1,)), ((), ())),
        precision=_PREC, preferred_element_type=F32,
    )  # (Cin, K, Cout)
    dw = dw.transpose(1, 0, 2)
    d_idx = np.zeros(idx_t.shape, dtype=jax.dtypes.float0)
    return dx, dw, d_idx


_conv3_op.defvjp(_conv3_op_fwd, _conv3_op_bwd)


def _conv3(x, idx_t, p):
    """k^3 submanifold conv, feature-major.

    x: (Cin, N); idx_t: (K', N) neighbor map (-1 = absent -> zeros);
    p["w"]: (K, Cin, Cout).  One gather + one dot_general contracting
    (K, Cin) jointly; output (Cout, N).  Custom VJP keeps the backward
    pass scatter-free (see _conv3_op_bwd).

    K' may exceed K: dilated configs stack per-dilation maps along the
    K axis ((D*kvol, N), cfg.n_nbr_maps), and each conv reads only its
    own kvol rows — plain convs the leading dilation-1 block.
    """
    return _conv3_op(x, p["w"], idx_t[: p["w"].shape[0]]) + p["b"][:, None]


def _irn(x, idx_t, p):
    out0 = _conv3(_relu(_conv3(x, idx_t, p["c00"])), idx_t, p["c01"])
    out1 = _conv1(_relu(_conv3(_relu(_conv1(x, p["c10"])), idx_t, p["c11"])), p["c12"])
    return jnp.concatenate([out0, out1], axis=0) + x


def _resnet_core(x, idx_t, p):
    """resnet.py:88-94: x + conv3(relu(conv3(x)))."""
    return x + _conv3(_relu(_conv3(x, idx_t, p["r0"])), idx_t, p["r1"])


def _dilated_core(x, idx_t, p):
    """DilatedResNet forward (resnet.py:136-143): per-dilation conv banks,
    channel-concat, 1x1 mix; twice; residual add.  ``idx_t`` carries the
    stacked per-dilation maps ((D*kvol, N), dilation order DILATION_LIST);
    each bank conv gets exactly its own kvol rows (the scatter-free VJP's
    offset antisymmetry holds per dilation: offsets*d flips sign with k
    exactly like offsets)."""
    kvol = p["dc0"][0]["w"].shape[0]
    maps = [idx_t[i * kvol: (i + 1) * kvol] for i in range(len(p["dc0"]))]
    out = jnp.concatenate(
        [_conv3(x, m, c) for m, c in zip(maps, p["dc0"])], axis=0
    )
    out = _relu(_conv1(out, p["dl0"]))
    out = jnp.concatenate(
        [_conv3(out, m, c) for m, c in zip(maps, p["dc1"])], axis=0
    )
    return _conv1(out, p["dl1"]) + x


def _block_core(y, idx_t, p):
    """ResNetBlock (resnet.py:146-162): ``core`` layers stacked, extra
    outer skip when >1.  Layer kind is dispatched on the parameter keys
    (inception: c00..c12; resnet: r0/r1)."""
    if "irn" in p:
        return _irn(y, idx_t, p["irn"])
    out = y
    for lp in p["core"]:
        if "c00" in lp:
            out = _irn(out, idx_t, lp)
        elif "dc0" in lp:
            out = _dilated_core(out, idx_t, lp)
        else:
            out = _resnet_core(out, idx_t, lp)
    if len(p["core"]) > 1:
        out = out + y
    return out


def _block(x, idx_t, p):
    y = _relu(_conv3(x, idx_t, p["conv_in"]))
    y = _block_core(y, idx_t, p)
    return _conv3(y, idx_t, p["conv_out"])


def _mlp2(x, l0, l1):
    return _conv1(_relu(_conv1(x, l0)), l1)


def scale_input_lut(params, cfg: ModelConfig):
    """(S, 128, ch) table of the per-scale input MLP over all 7-bit
    neighbor-feature codes (equivalent to model_core.py:46-57 evaluated on
    every possible input)."""
    codes = jnp.arange(128, dtype=jnp.int32)
    bits = ((codes[None, :] >> jnp.arange(7, dtype=jnp.int32)[:, None]) & 1).astype(F32)

    def per_scale(emb_s, l0, l1):
        x = jnp.concatenate(
            [jnp.broadcast_to(emb_s[:, None], (emb_s.shape[0], 128)), bits],
            axis=0,
        )  # (emb+7, 128)
        return _mlp2(x, l0, l1).T  # (128, ch)

    return jax.vmap(per_scale)(
        params["scale_emb"], params["scale_mlp"]["l0"], params["scale_mlp"]["l1"]
    )


def _input_features(params, cfg: ModelConfig, scale_code):
    """Gather the input embedding per node: scale_code = scale_id*128 +
    feat_code, (N,).  Returns (ch, N)."""
    lut = scale_input_lut(params, cfg)  # (S, 128, ch)
    flat = lut.reshape(-1, lut.shape[-1]).T  # (ch, S*128)
    return jnp.take(flat, scale_code, axis=1)


def _stage_context(params, x_glob, occ_t, idx_t, stage: int):
    """Context fed to stage ``stage``: x_glob (+ occupancy-context block
    over the already-coded group bits for stage >= 1; upsample.py:204-214).
    ``occ_t`` is feature-major ground truth in group-perm octant order
    (>= cum_prev[stage] channels; the block reads its conv_in width)."""
    if stage == 0:
        return x_glob
    p = params["outer"][stage - 1]
    cin = p["conv_in"]["w"].shape[1]
    return x_glob + _block(occ_t[:cin], idx_t, p)


def _stage_head(params, ctx, idx_t, stage: int):
    """Per-stage head: prune conv then the [ch -> 24 -> group-width] MLP
    (upsample.py:137-161); returns logits (len(group), N)."""
    h = _conv3(ctx, idx_t, {"w": params["prune"]["w"][stage], "b": params["prune"]["b"][stage]})
    l1_all = params["inner_mlp"]["l1"]
    l0 = {"w": params["inner_mlp"]["l0"]["w"][stage], "b": params["inner_mlp"]["l0"]["b"][stage]}
    if isinstance(l1_all, tuple):
        l1 = l1_all[stage]
    else:
        l1 = {"w": l1_all["w"][stage], "b": l1_all["b"][stage]}
    return _mlp2(h, l0, l1)


def forward_all_stages(params, cfg: ModelConfig, scale_id, feat_code, idx_t, occ_t):
    """Training-path forward over a flat multi-scale node array.

    Args:
      scale_id:  (N,) int32 scale index per node.
      feat_code: (N,) int32 packed 7-neighbor occupancy feature.
      idx_t:     (K, N) int32 transposed neighbor map (-1 absent).
      occ_t:     (8, N) float32 ground-truth occupancy bits, feature-major.

    Returns logits (8, N).

    Memory discipline: the 8 stages are data-independent given ``x_glob``
    (each reads only ground-truth occupancy channels), so an unrolled
    forward lets XLA overlap all 8 stage *backwards* and their
    rematerialized gathers coexist in HBM (measured: OOM at ~0.6M nodes).
    Running the stages as a ``lax.scan`` over the traced-stage executables
    (the same ones the codec uses) serializes them by construction —
    peak memory is ONE stage's working set — and compiles ~8x less code.
    ``jax.checkpoint`` inside the body additionally drops each stage's
    gather temporaries between forward and backward.
    """
    intensor = _input_features(params, cfg, scale_id * 128 + feat_code)

    block_in = jax.checkpoint(lambda p, xi: _block(xi, idx_t, p["block_in"]))
    x_glob = block_in(params, intensor)
    perm = np.asarray(cfg.group_perm)
    occ_ctx = occ_t[perm][: cfg.ctx_channels]  # group-perm octant order

    def body(_, stage):
        def run(p, xg, o7):
            ctx = stage_context_traced(p, cfg, stage, xg, o7, idx_t)
            return stage_head_traced(p, cfg, stage, ctx, idx_t)

        return None, jax.checkpoint(run)(params, x_glob, occ_ctx)

    _, logits = jax.lax.scan(
        body, None, jnp.arange(cfg.outstage, dtype=jnp.int32)
    )  # (outstage, gmax, N); rows past each group's width are padding
    # reassemble to octant-order (8, N): octant perm[cum_prev[g]+j] is
    # stage g's j-th group bit (static indexing)
    rows = [None] * 8
    for g, grp in enumerate(cfg.groups):
        for j, o in enumerate(grp):
            rows[o] = logits[g, j]
    return jnp.stack(rows)  # (8, N)


def training_bits(params, cfg: ModelConfig, scale_id, feat_code, idx_t, occ_t, mask):
    """Total code-length estimate in bits over valid nodes: the sum-BCE/ln2
    loss of the reference (model_core.py:77-80), numerically stabilized via
    logits.  ``occ_t`` feature-major (8, N); ``mask`` (N,)."""
    logits = forward_all_stages(params, cfg, scale_id, feat_code, idx_t, occ_t)
    # stable sigmoid BCE: max(l,0) - l*y + log1p(exp(-|l|))
    bce = jnp.maximum(logits, 0.0) - logits * occ_t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    bce = jnp.where(mask[None, :], bce, 0.0)
    return jnp.sum(bce) / LN2


# ------------------------------------------------------------ codec path --


def stack_outer_blocks(params, cfg: ModelConfig):
    """Stack the ragged per-stage occupancy-context blocks into dense
    tensors with zero-padded input channels.

    outer[i].conv_in has in_channels = i+1; zero-padding it to
    ``outstage-1`` channels is mathematically exact (zero weights
    contribute exactly 0.0), and makes the stage index a *traced* scalar:
    one compiled executable covers all 8 stages, which matters on TPU
    where each new (shape, static-arg) combination is a fresh compile.
    """
    k = cfg.ctx_channels  # 7 at the default outstage=8
    conv_in_w = jnp.stack(
        [
            jnp.pad(p["conv_in"]["w"], ((0, 0), (0, k - cfg.cum_group[i]), (0, 0)))
            for i, p in enumerate(params["outer"])
        ]
    )  # (outstage-1, kvol, k, ch)

    def stack(fn):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[fn(p) for p in params["outer"]]
        )

    return {
        "conv_in_w": conv_in_w,
        "conv_in_b": jnp.stack([p["conv_in"]["b"] for p in params["outer"]]),
        "irn": stack(lambda p: p["irn"]),
        "conv_out": stack(lambda p: p["conv_out"]),
    }


def stage_context_traced(params, cfg: ModelConfig, stage, x_glob, occ7_t, idx_t):
    """Context for a *traced* stage index.

    ``occ7_t`` is (ctx_channels, N) float32 feature-major in GROUP-PERM
    octant order (cfg.group_perm); channels not yet decoded before
    ``stage`` are masked to zero here, so the encoder may pass full
    ground truth and the decoder its partially-filled buffer — both
    sides feed the executable identical values (the encoder/decoder
    bit-identity requirement).  At the default outstage=8 this is the
    familiar (7, N) buffer with channel c visible iff c < stage.
    """
    k = cfg.ctx_channels
    cum_prev = jnp.asarray((0,) + cfg.cum_group[:-1], jnp.int32)
    vis = jnp.take(cum_prev, stage)
    occ_masked = occ7_t * (jnp.arange(k) < vis).astype(F32)[:, None]
    st = stack_outer_blocks(params, cfg)
    idx = jnp.maximum(stage - 1, 0)
    blk = {
        "conv_in": {"w": st["conv_in_w"][idx], "b": st["conv_in_b"][idx]},
        "irn": jax.tree_util.tree_map(lambda a: a[idx], st["irn"]),
        "conv_out": jax.tree_util.tree_map(lambda a: a[idx], st["conv_out"]),
    }
    ctx_occ = _block(occ_masked, idx_t, blk)
    return x_glob + jnp.where(stage > 0, 1.0, 0.0) * ctx_occ


def stack_heads(params, cfg: ModelConfig):
    """Dense (outstage, hidden, gmax)/(outstage, gmax) view of the
    per-stage l1 heads; ragged groupings zero-pad each stage's out-width
    to ``gmax`` (pad logits are discarded by the callers' group masks).
    At outstage=8 the parameters already ARE this stack."""
    l1 = params["inner_mlp"]["l1"]
    if not isinstance(l1, tuple):
        return l1
    g = cfg.gmax
    return {
        "w": jnp.stack([
            jnp.pad(p["w"], ((0, 0), (0, g - p["w"].shape[1]))) for p in l1
        ]),
        "b": jnp.stack([jnp.pad(p["b"], (0, g - p["b"].shape[0])) for p in l1]),
    }


def stage_head_traced(params, cfg: ModelConfig, stage, ctx, idx_t):
    """Logits (gmax, N) for the ``stage``'s group bits (rows past the
    group's width are padding)."""
    h = _conv3(
        ctx,
        idx_t,
        {"w": params["prune"]["w"][stage], "b": params["prune"]["b"][stage]},
    )
    l1s = stack_heads(params, cfg)
    l0 = {
        "w": params["inner_mlp"]["l0"]["w"][stage],
        "b": params["inner_mlp"]["l0"]["b"][stage],
    }
    l1 = {"w": l1s["w"][stage], "b": l1s["b"][stage]}
    return _mlp2(h, l0, l1)


@partial(jax.jit, static_argnames=("cfg",))
def level_context(params, cfg: ModelConfig, scale_idx, feat_code, idx_t):
    """Per-level global context for the production codec; returns (ch, N)
    feature-major.

    ``scale_idx`` is a traced scalar; encoder and decoder call this with the
    same padded shapes so the executable (and hence the f32 bits of the
    output) is identical on both sides.
    """
    intensor = _input_features(params, cfg, scale_idx * 128 + feat_code)
    return _block(intensor, idx_t, params["block_in"])


@partial(jax.jit, static_argnames=("cfg", "stage"))
def stage_logits(params, cfg: ModelConfig, stage: int, x_glob, occ_t, idx_t):
    """Static-stage logits for API convenience/tests; the production codec
    uses the traced-stage path (stage_context_traced + stage_head_traced).
    ``occ_t`` must be (stage, N) feature-major (empty for stage 0)."""
    ctx = _stage_context(params, x_glob, occ_t, idx_t, stage)
    return _stage_head(params, ctx, idx_t, stage)
