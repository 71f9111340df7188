"""Stage-batched superbrick implementation of the occupancy network — the
TPU hot path (v2, replacing models/brick_network.py as the default
training backend; that one is kept for equivalence testing).

Same math as models/network.py (the reference's LINR_PCGC_Model + CNP,
/root/reference/models/model_core.py:19-81, upsample.py:37-217), two
data-organization changes over the round-1 brick backend, both aimed at
the measured bottleneck (gather row-rate, ~50M rows/s on v5e):

  1. *Superbrick gathers* (ops/superbricks.py): halo exchange at 8^3
     granularity (8x fewer gathered rows, 2-8KB rows = bandwidth-bound),
     then a static sub-halo extraction down to the 4^3 sub-bricks whose
     dense (M, C*216) x (C*216, O*64) matmul was measured at ~83% of MXU
     peak in round 1.

  2. *Stage batching*: the 8 CNP stages are data-independent given
     x_glob (training feeds ground-truth occupancy, masked per stage
     inside the executable — the encoder/decoder symmetry argument of
     network.py), so all stages' convolutions run as ONE batched conv
     with the stage axis folded next to channels: one halo exchange
     serves 8 stages (8x fewer gather calls, 8x bigger rows).  The
     per-stage ragged weights reuse network.stack_outer_blocks'
     zero-padded stacking (mathematically exact).

Activations are (Bb, S, C, slots): brick-major, static stage batch S,
channels, dense brick slots on the lanes (slots = 64 for the default
side=4 bricks, 512 for side=8 — the code reads code.shape[-1]).  Unoccupied slots are
kept exactly zero after every conv (+bias, masked), which makes the
dense convolution equal to the reference's submanifold convolution.

Rematerialization: conv outputs are tagged with checkpoint_name('act');
training wraps the loss in jax.checkpoint(policy=save_only_these_names
('act')), so the multi-GB halo / extraction temporaries are never saved
for the backward pass — they are recomputed per conv from the saved
activations (and folded back scatter-free, ops/superbricks.sb_halo VJP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .network import ModelConfig, _PREC, F32, LN2, stack_outer_blocks
from ..ops.superbricks import (
    B4_HALO_VOL,
    B4_SLOTS,
    _conv_kernel_mode,
    b4_convsm,
    b4_convsm_bm,
    b4_halo_sm,
    b4_conv_weight_matrix_sm,
    SB_SLOTS,
    SUB_HALO,
    SUB_HALO_VOL,
    SUB_OFFSETS,
    SUB_SLOTS,
    b4_halo,
    b4_conv_weight_matrix,
    sb_halo,
    sb_conv_weight_matrix,
    sb_yz_select,
)

ACT = "act"  # checkpoint_name tag for saved activations


def _prec(dt):
    return _PREC if dt == F32 else jax.lax.Precision.DEFAULT


def _acc(dt):
    # bf16 path: accumulate in the compute dtype (output is cast anyway,
    # and CPU's dot kernel lacks BF16xBF16->F32)
    return F32 if dt == F32 else dt


def b4conv3(x, geom, w, b):
    """Stage-batched 3^3 conv at 4^3 brick granularity — the hot path.

    x: (Bb, S, C, 64); w: (S, 27, C, O); b: (S, O).  ONE halo exchange in
    the flat group-ordered (Bb, S*C, 216) layout, which IS the conv
    matmul operand: the weight matrix (b4_conv_weight_matrix) encodes the
    spatial un-permutation, so there is no extraction, no selection, and
    no output assembly (the einsum's (Bb, S, O*64) output is the brick).
    The barrier materializes the halo once instead of letting XLA refuse
    the 27 fragment gathers into the matmul operand read.
    Returns (Bb, S, O, 64), tagged as a saved activation.
    """
    dt = geom["dtype"]
    bb, s, c, _ = x.shape
    o = w.shape[-1]
    xm = x.astype(dt).reshape(bb, s * c, B4_SLOTS)
    # NOTE on the barrier shape: keep it 3-D.  A 2-D (Bb*SC, 216) view
    # here made XLA re-express the halo assembly as a 54-piece 2-D concat
    # and keep MULTIPLE conv halos alive at once (measured 43 GB).  The
    # 3-D form occasionally costs a padded copy under f32 (layout
    # {1,0,2}), but is the proven-stable bf16 production path.
    h = jax.lax.optimization_barrier(b4_halo(xm, geom["nbr27"]))
    ext = h.reshape(bb, s, c * B4_HALO_VOL)
    w2 = b4_conv_weight_matrix(w).astype(dt)  # (S, C*216, O*64)
    y = jnp.einsum(
        "bsk,skn->bsn", ext, w2,
        precision=_prec(dt), preferred_element_type=_acc(dt),
    ).reshape(bb, s, o, B4_SLOTS)
    y = (y + b[None, :, :, None]) * geom["mask"]
    return checkpoint_name(y.astype(dt), ACT)


def b4conv3_sm(x, geom, w, b):
    """Stage-batched 3^3 conv, SLOT-MAJOR — the production fast path
    (round 3; see ops/superbricks.py "SLOT-MAJOR layout" and
    scripts/prof_flat2.py: 7.2 ms vs 23.3 ms per conv at group shapes).

    x: (Bb, S, 64*C) slot-major channel-minor; w: (S, 27, C, O); b:
    (S, O).  ONE slot-major halo exchange whose concat output IS the MXU
    matmul operand — the spatial un-permutation AND the channel/slot
    interleave both live in the weight matrix (b4_conv_weight_matrix_sm),
    so the einsum's (Bb, S, 64*O) output is directly the next conv's
    input.  The whole halo+matmul is one custom-VJP primitive
    (ops/superbricks.b4_convsm) whose backward runs a single halo
    exchange of dy (transposed conv) — 2 gather passes per
    value_and_grad instead of 3, no halo residual.
    Returns (Bb, S, 64*O), tagged as a saved activation.
    """
    dt = geom["dtype"]
    bb, s, vc = x.shape
    o = w.shape[-1]
    if _conv_kernel_mode() == "pallas":
        # epilogue fused in-kernel: a pallas_call is a fusion boundary,
        # so bias+mask would otherwise cost an extra pass over y
        y = b4_convsm_bm(
            x.astype(dt), w, b, geom["mask"][:, 0, 0, :], geom["nbr27"]
        )
        return checkpoint_name(y.astype(dt), ACT)
    y = b4_convsm(x.astype(dt), w, geom["nbr27"])
    # bias + mask in the FLAT layout: a (Bb, S, 64, O<=24) view pays the
    # 128-lane tile pad at materialization (docs/DESIGN.md layout laws);
    # tiling b over slots / repeating the slot mask over channels keeps
    # every elementwise op at minor dim 64*O.
    y = y + jnp.tile(b, (1, B4_SLOTS))[None].astype(dt)
    y = y * _mask_flat(geom, o)
    return checkpoint_name(y.astype(dt), ACT)


def sbconv3(x, geom, w, b):
    """Stage-batched 3^3 superbrick conv (dispatches to the 4^3 fast path
    when the slot axis says so).

    x: (Bb, S, C, slots); w: (S, 27, C, O) canonical kernel; b: (S, O).
    One halo exchange at 8^3 over the merged (S*C) channel axis — in the
    GROUP-ORDERED (Bb, SC, 10, 100) layout (ops/superbricks.py: no tensor
    ever materializes spatial minor dims, the measured 8-16x TPU tile-pad
    blow-up) — then a loop over the 8 static sub-brick offsets: x-slice +
    (100, 36) yz-selection matmul extracts ONE (Bb, S, C*216) sub-halo
    slab, immediately consumed by its batched MXU conv matmul before the
    next slab is materialized.  Output is re-assembled to superbrick
    slots, bias + slot mask.
    Returns (Bb, S, O, slots), tagged as a saved activation.
    """
    if x.ndim == 3:
        return b4conv3_sm(x, geom, w, b)
    if x.shape[-1] == B4_SLOTS:
        return b4conv3(x, geom, w, b)
    dt = geom["dtype"]
    bb, s, c, _ = x.shape
    o = w.shape[-1]
    xm = x.astype(dt).reshape(bb, s * c, SB_SLOTS)
    # The barrier forces ONE materialization of the halo.  Without it XLA
    # fuses the 27 fragment gathers into each of the 8 extraction einsums
    # (measured 65 ms vs 1.6 ms halo + 1.6 ms extractions at production
    # level-0 shapes — a 20x regression from consumer-side refusion).
    hv = jax.lax.optimization_barrier(sb_halo(xm, geom["nbr27"]))
    w2 = sb_conv_weight_matrix(w).astype(dt)             # (S, C*216, O*64)
    ys = []
    for (i, j, k) in SUB_OFFSETS:
        ext_p = sb_yz_select(hv[:, :, i: i + SUB_HALO, :], j, k).reshape(
            bb, s, c * SUB_HALO_VOL
        )
        ys.append(
            jnp.einsum(
                "bsk,skn->bsn", ext_p, w2,
                precision=_prec(dt), preferred_element_type=_acc(dt),
            )
        )                                                # (Bb, S, O*64)
    # sub-brick p=(i,j,k in {0,4}) slot (x,y,z) -> superbrick slot
    # ((i+x)<<6)|((j+y)<<3)|(k+z): static transpose
    y = jnp.stack(ys).reshape(2, 2, 2, bb, s, o, 4, 4, 4)
    y = jnp.transpose(y, (3, 4, 5, 0, 6, 1, 7, 2, 8)).reshape(
        bb, s, o, SB_SLOTS
    )
    y = (y + b[None, :, :, None]) * geom["mask"]
    return checkpoint_name(y.astype(dt), ACT)


def _mask_flat(geom, o: int):
    """Slot mask repeated over ``o`` channel-minor lanes: (Bb, 1, 64*o).
    Computed per call (NOT cached on the geom dict: geom leaves are
    tracers under jit, and a cross-trace cache leaks them); identical
    repeats within one executable are CSE'd by XLA."""
    m = geom["mask"][:, 0, 0, :]  # (Bb, 64)
    return jnp.repeat(m, o, axis=-1)[:, None, :]


def sbconv1(x, geom, w, b):
    """Stage-batched 1^3 conv: x (Bb, S, C, slots) channel-major or
    (Bb, S, slots*C) slot-major; w (S, C, O), b (S, O).

    Slot-major runs as ONE (64C -> 64O) matmul with a block-diagonal
    weight (64 copies of w on the diagonal): the direct
    "bsvc,sco->bsvo" einsum is a K=C<=24, N=O<=24 matmul over a
    (.., 64, C) view — both MXU-hostile (128-lane tile pad on the view,
    ~6% systolic utilization at K=8).  The block-diagonal form wastes
    64x the FLOPs (still ~1 ms at group shapes) but streams flat
    (Bb, S, 64C) operands straight through the MXU and emits the next
    conv's input layout with no relayout."""
    dt = geom["dtype"]
    if x.ndim == 3:
        bb, s, vc = x.shape
        c, o = w.shape[-2], w.shape[-1]
        eye = jnp.eye(B4_SLOTS, dtype=dt)
        wbd = (
            eye[None, :, None, :, None] * w.astype(dt)[:, None, :, None, :]
        ).reshape(w.shape[0], B4_SLOTS * c, B4_SLOTS * o)
        y = jnp.einsum(
            "bsk,skn->bsn", x.astype(dt), wbd,
            precision=_prec(dt), preferred_element_type=_acc(dt),
        )
        y = y + jnp.tile(b, (1, B4_SLOTS))[None].astype(dt)
        y = y * _mask_flat(geom, o)
        return y.astype(dt)
    y = jnp.einsum(
        "bscv,sco->bsov", x.astype(dt), w.astype(dt),
        precision=_prec(dt), preferred_element_type=_acc(dt),
    )
    y = (y + b[None, :, :, None]) * geom["mask"]
    return y.astype(dt)


def _relu(x):
    return jnp.maximum(x, 0.0)


def _sb_irn(x, geom, p):
    """InceptionResNet (resnet.py:7-60), stage-batched.

    Slot-major runs the two branches' leading 3^3 convs (c00 on x, c11 on
    relu(c10(x))) as ONE conv on the per-slot channel concatenation with
    block weights: the halo exchange is gather ROW-rate bound (27 x Bb
    rows regardless of channel width), so concatenating channels halves
    the gathered row count for these two convs.  The block-zero weight
    positions contribute exact 0.0 terms, and their dw flows nowhere
    (w_cat is built from the params by scatter, so autodiff routes only
    the live blocks back).
    """
    if x.ndim == 3:
        bb, s, _ = x.shape
        c = p["c00"]["w"].shape[-2]
        h = c // 2
        t = _relu(sbconv1(x, geom, p["c10"]["w"], p["c10"]["b"]))
        xc = jnp.concatenate(
            [
                x.reshape(bb, s, B4_SLOTS, c),
                t.reshape(bb, s, B4_SLOTS, h),
            ],
            axis=-1,
        ).reshape(bb, s, -1)  # (Bb, S, 64*(c+h))
        w00, w11 = p["c00"]["w"], p["c11"]["w"]  # (S,27,c,h), (S,27,h,h)
        w_cat = jnp.zeros(
            (w00.shape[0], w00.shape[1], c + h, c), w00.dtype
        )
        w_cat = w_cat.at[:, :, :c, :h].set(w00)
        w_cat = w_cat.at[:, :, c:, h:].set(w11)
        b_cat = jnp.concatenate([p["c00"]["b"], p["c11"]["b"]], axis=-1)
        y = b4conv3_sm(xc, geom, w_cat, b_cat).reshape(bb, s, B4_SLOTS, c)
        out0 = sbconv3(
            _relu(y[..., :h].reshape(bb, s, -1)),
            geom, p["c01"]["w"], p["c01"]["b"],
        )
        out1 = sbconv1(
            _relu(y[..., h:].reshape(bb, s, -1)),
            geom, p["c12"]["w"], p["c12"]["b"],
        )
        h0 = out0.reshape(bb, s, B4_SLOTS, -1)
        h1 = out1.reshape(bb, s, B4_SLOTS, -1)
        return jnp.concatenate([h0, h1], axis=-1).reshape(bb, s, -1) + x
    out0 = sbconv3(
        _relu(sbconv3(x, geom, p["c00"]["w"], p["c00"]["b"])),
        geom, p["c01"]["w"], p["c01"]["b"],
    )
    out1 = sbconv1(
        _relu(
            sbconv3(
                _relu(sbconv1(x, geom, p["c10"]["w"], p["c10"]["b"])),
                geom, p["c11"]["w"], p["c11"]["b"],
            )
        ),
        geom, p["c12"]["w"], p["c12"]["b"],
    )
    return jnp.concatenate([out0, out1], axis=2) + x


def _sb_resnet(x, geom, p):
    """resnet.py:88-94: x + conv3(relu(conv3(x))), stage-batched."""
    h = _relu(sbconv3(x, geom, p["r0"]["w"], p["r0"]["b"]))
    return x + sbconv3(h, geom, p["r1"]["w"], p["r1"]["b"])


def _sb_block_core(y, geom, p):
    """ResNetBlock (resnet.py:146-162): stacked cores + outer skip when >1;
    layer kind dispatched on parameter keys (cf. network._block_core)."""
    if "irn" in p:
        return _sb_irn(y, geom, p["irn"])
    out = y
    for lp in p["core"]:
        if "dc0" in lp:
            raise NotImplementedError(
                "DilatedResNet runs on the gather backend only (its d=2 "
                "convs need a second neighbor map the brick layout does "
                "not carry); backend selection should not have routed a "
                "block_type='dilation' model here"
            )
        out = _sb_irn(out, geom, lp) if "c00" in lp else _sb_resnet(out, geom, lp)
    if len(p["core"]) > 1:
        out = out + y
    return out


def _sb_block(x, geom, p):
    """make_block (upsample.py:88-97): conv -> relu -> ResNetBlock -> conv."""
    y = _relu(sbconv3(x, geom, p["conv_in"]["w"], p["conv_in"]["b"]))
    y = _sb_block_core(y, geom, p)
    return sbconv3(y, geom, p["conv_out"]["w"], p["conv_out"]["b"])


def _sb_mlp2(x, geom, l0, l1):
    return sbconv1(
        _relu(sbconv1(x, geom, l0["w"], l0["b"])), geom, l1["w"], l1["b"]
    )


def _stack1(tree):
    """Add a leading S=1 stage axis to every leaf."""
    return jax.tree_util.tree_map(lambda a: a[None], tree)


def sb_input_features(params, cfg: ModelConfig, geom, level_slices):
    """Per-slot input embedding: per-level scale MLP over
    [scale embedding ++ 7 neighbor-occupancy bit planes]
    (model_core.py:31-34,46-57).  Levels are static contiguous segments
    of the superbrick axis; ``level_slices`` entries are
    (start, end, scale_idx) — the scale index is carried explicitly so a
    level *group* (a contiguous sub-range of levels, see
    runtime/sb_overfit's grouped gradient accumulation) can be processed
    with correct per-scale parameters.  Returns (Bb, 1, ch, slots)
    channel-major (side=8) or (Bb, 1, slots*ch) slot-major (side=4, the
    production layout)."""
    dt = geom["dtype"]
    code = geom["code"]  # (Bb, slots) int, scale*128+feat, -1 empty
    slots = code.shape[-1]
    sm = slots == B4_SLOTS
    feat = code & 127
    if sm:
        bits = jnp.stack(
            [((feat >> k) & 1).astype(dt) for k in range(cfg.in_channel)],
            axis=-1,
        )  # (Bb, 64, 7) channel-minor
        bits = bits * geom["mask"][:, 0, 0, :, None]
    else:
        bits = jnp.stack(
            [((feat >> k) & 1).astype(dt) for k in range(cfg.in_channel)],
            axis=1,
        )  # (Bb, 7, slots)
        bits = bits * geom["mask"][:, 0]
    parts = []
    for (a, b, s) in level_slices:
        seg_geom = dict(geom, mask=geom["mask"][a:b])
        emb = params["scale_emb"][s].astype(dt)  # (emb,)
        if sm:
            seg = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        emb[None, None, :], (b - a, slots, emb.shape[0])
                    )
                    * seg_geom["mask"][:, 0, 0, :, None],
                    bits[a:b],
                ],
                axis=-1,
            )[:, None].reshape(b - a, 1, slots * (emb.shape[0] + cfg.in_channel))
        else:
            seg = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        emb[None, :, None], (b - a, emb.shape[0], slots)
                    )
                    * seg_geom["mask"][:, 0],
                    bits[a:b],
                ],
                axis=1,
            )[:, None]  # (seg, 1, emb+7, slots)
        l0 = _stack1(
            jax.tree_util.tree_map(lambda x: x[s], params["scale_mlp"]["l0"])
        )
        l1 = _stack1(
            jax.tree_util.tree_map(lambda x: x[s], params["scale_mlp"]["l1"])
        )
        parts.append(_sb_mlp2(seg, seg_geom, l0, l1))
    return jnp.concatenate(parts, axis=0)  # (Bb, 1, [slots*]ch[, slots])


def _occ_context_input(occ7, tri, geom, sm):
    """The context blocks' input: 7 known-occupancy channels, channel c
    visible to stage row r iff tri[r, c] (upsample.py:204-214 semantics).

    occ7 (Bb, 7, slots), tri (S, 7) -> (Bb, S, 7, slots) channel-major,
    or (Bb, S, slots*7) slot-major channel-minor (the production side=4
    layout, where every conv operand keeps channels contiguous per slot).
    """
    if not sm:
        occ_b = occ7[:, None, :, :] * tri[None, :, :, None]
        return occ_b * geom["mask"]
    occ_v = jnp.swapaxes(occ7, 1, 2)  # (Bb, slots, 7)
    occ_v = occ_v * geom["mask"][:, 0, 0, :, None]
    occ_b = occ_v[:, None, :, :] * tri[None, :, None, :]
    bb, s = occ_b.shape[0], occ_b.shape[1]
    return occ_b.reshape(bb, s, -1)


def sb_forward_all_stages(params, cfg: ModelConfig, geom, occ_t, level_slices,
                          stage_range=None):
    """Logits (Bb, Sc, slots) for stages [a, b) (default: all 8).
    occ_t: (Bb, 8, slots) ground truth in the compute dtype.

    Stages in the range run as one batched pass: stage j's context block
    sees occupancy channels 0..j-1 (channel c masked by c < j — the same
    in-executable masking as network.stage_context_traced, so encoder
    ground truth and decoder partial buffers produce identical values).

    ``stage_range`` exists because the loss decomposes over stages just
    like over levels: the trainer accumulates gradients per
    (level-group x stage-chunk) unit to bound peak HBM (the S axis scales
    every halo/extraction temporary linearly).
    """
    dt = geom["dtype"]
    k = cfg.outstage - 1  # 7
    a, b = (0, cfg.outstage) if stage_range is None else stage_range

    sm = geom["code"].shape[-1] == B4_SLOTS
    intensor = sb_input_features(params, cfg, geom, level_slices)
    x_glob = _sb_block(intensor, geom, _stack1(params["block_in"]))

    # context blocks j-1 serve stages j in [max(a,1), b)
    ca, cb = max(a, 1) - 1, b - 1
    if cb > ca:
        occ7 = occ_t[:, :k, :]  # (Bb, 7, slots)
        # row for stage j: occupancy channel c visible iff c < j
        rows = jnp.arange(ca + 1, cb + 1)  # stages with a context block
        tri = (rows[:, None] > jnp.arange(k)[None, :]).astype(dt)
        occ_b = _occ_context_input(occ7, tri, geom, sm)

        st = stack_outer_blocks(params, cfg)
        sl = lambda t: jax.tree_util.tree_map(lambda x: x[ca:cb], t)
        outer = {
            "conv_in": {"w": st["conv_in_w"][ca:cb], "b": st["conv_in_b"][ca:cb]},
            "irn": sl(st["irn"]),
            "conv_out": sl(st["conv_out"]),
        }
        ctx = _sb_block(occ_b, geom, outer)  # (Bb, cb-ca, ch, slots)
        if a == 0:
            # stage 0 = x_glob alone (upsample.py:204-214)
            ctx = jnp.concatenate([jnp.zeros_like(ctx[:, :1]), ctx], axis=1)
        ctx_full = ctx + x_glob
    else:
        ctx_full = jnp.broadcast_to(
            x_glob, (x_glob.shape[0], b - a) + x_glob.shape[2:]
        )

    h = sbconv3(
        ctx_full, geom, params["prune"]["w"][a:b], params["prune"]["b"][a:b]
    )
    logits = _sb_mlp2(
        h,
        geom,
        {
            "w": params["inner_mlp"]["l0"]["w"][a:b],
            "b": params["inner_mlp"]["l0"]["b"][a:b],
        },
        {
            "w": params["inner_mlp"]["l1"]["w"][a:b],
            "b": params["inner_mlp"]["l1"]["b"][a:b],
        },
    )  # (Bb, b-a, 1, slots) cm / (Bb, b-a, slots) sm
    return logits if logits.ndim == 3 else logits[:, :, 0, :]


def sb_x_glob(params, cfg: ModelConfig, geom, level_slices):
    """The stage-independent context: input embedding -> block_in.
    Computed ONCE per (frame, level-group) and shared by every stage
    chunk via explicit VJP composition in the trainer (block_in is 5 of
    the 11 convolutions of a stage pass — recomputing it per chunk was
    pure waste).  Returns (Bb, 1, ch, slots)."""
    intensor = sb_input_features(params, cfg, geom, level_slices)
    return _sb_block(intensor, geom, _stack1(params["block_in"]))


def sb_chunk_logits(params, cfg: ModelConfig, geom, occ_t, base, cs: int,
                    x_glob, first: bool = False):
    """Logits (Bb, cs, slots) for the ``cs`` stages starting at traced
    index ``base``, given a precomputed ``x_glob``.

    Uniform shapes for every chunk (so ONE compiled graph serves all
    chunk positions): stage j's context block is indexed clip(j-1, 0) and
    its output is multiplied by [j > 0], exactly the trick of
    network.stage_context_traced.  ``first=True`` (STATIC) specializes
    the base==0 chunk: stage 0's context is x_glob alone
    (upsample.py:204-214), so its gated-to-zero context row is simply
    NOT COMPUTED — the block runs cs-1 rows instead of cs (round-5:
    that row was ~1/cs of every first-chunk block conv).  The occupancy
    masking (channel c visible iff c < stage) keeps encoder ground truth
    and decoder partial buffers bit-identical — this is also the codec's
    per-stage executable.
    """
    dt = geom["dtype"]
    k = cfg.outstage - 1
    sm = geom["code"].shape[-1] == B4_SLOTS
    occ_f = occ_t.astype(dt)
    rows = base + jnp.arange(cs)  # traced stage indices
    # first only pays at cs >= 3: dropping the row at cs=2 leaves an
    # S=1 context block whose (Bb, 1, X) operands sublane-pad 8x —
    # measured 36.4 vs 16.2 ms per stage dispatch at level-0 codec
    # shapes (scripts/prof_probs.py).  Normalizing HERE keeps both codec
    # sides' executables identical (first is derived from shared b0/cs).
    first = first and cs >= 3
    crows = rows[1:] if first else rows  # rows with a real context block
    occ7 = occ_f[:, :k, :]
    tri = (crows[:, None] > jnp.arange(k)[None, :]).astype(dt)
    occ_b = _occ_context_input(occ7, tri, geom, sm)

    st = stack_outer_blocks(params, cfg)
    idx = jnp.clip(crows - 1, 0)
    tk = lambda a: jnp.take(a, idx, axis=0)
    outer = {
        "conv_in": {"w": tk(st["conv_in_w"]), "b": tk(st["conv_in_b"])},
        "irn": jax.tree_util.tree_map(tk, st["irn"]),
        "conv_out": jax.tree_util.tree_map(tk, st["conv_out"]),
    }
    if first and cs == 1:
        # the whole chunk is stage 0: no context block at all
        ctx_full = x_glob
    elif first:
        ctx = _sb_block(occ_b, geom, outer)  # (Bb, cs-1, ...)
        # stage 0 = x_glob alone; no gate needed (every crow is real)
        ctx_full = jnp.concatenate([x_glob, x_glob + ctx], axis=1)
    else:
        ctx = _sb_block(occ_b, geom, outer)  # (Bb, cs, ...)
        gate = (rows > 0).astype(dt)
        gate = (
            gate[None, :, None] if ctx.ndim == 3
            else gate[None, :, None, None]
        )
        ctx_full = x_glob + gate * ctx

    tr = lambda a: jnp.take(a, rows, axis=0)
    h = sbconv3(ctx_full, geom, tr(params["prune"]["w"]), tr(params["prune"]["b"]))
    logits = _sb_mlp2(
        h,
        geom,
        {"w": tr(params["inner_mlp"]["l0"]["w"]), "b": tr(params["inner_mlp"]["l0"]["b"])},
        {"w": tr(params["inner_mlp"]["l1"]["w"]), "b": tr(params["inner_mlp"]["l1"]["b"])},
    )
    return logits if logits.ndim == 3 else logits[:, :, 0, :]


def sb_fused_chunk_logits(params, cfg: ModelConfig, geom, occ_t, base,
                          cs: int, level_slices, first: bool = False):
    """Logits (Bb, cs, slots) for ``cs`` stages starting at traced index
    ``base`` — block_in FUSED into the stage-batched context pass.

    Rationale (measured, scripts/prof_step.py): the halo exchange is
    gather ROW-rate bound — 27 x Bb rows per conv regardless of the
    stage-batch width S, so an S=1 x_glob pass costs nearly as much as a
    whole S=4 chunk (335 vs 421 ms at 81920 bricks).  block_in and the
    outer context blocks share one architecture (conv-irn-conv, ch
    channels; init_params: block variants apply to block_in only, and
    this fused path requires the default 1-layer inception block_in —
    callers fall back to sb_chunk_logits + sb_x_glob otherwise), so the
    input-feature row rides the SAME halo exchanges as the cs context
    rows: S' = 1 + cs, amortizing every gather across all stages.

    Exact: row 0 computes block_in on the input features (= x_glob),
    rows 1..cs the stage contexts; the occupancy context input is
    zero-padded from 7 to ch channels to match block_in's conv_in width
    (zero weights contribute exactly 0.0, cf. stack_outer_blocks).
    """
    dt = geom["dtype"]
    k = cfg.outstage - 1
    ch = cfg.ch
    sm = geom["code"].shape[-1] == B4_SLOTS
    rows = base + jnp.arange(cs)
    # first=True (STATIC): stage 0's context is x_glob alone, so its
    # gated-to-zero context row is not computed — the block runs
    # 1 + (cs-1) rows instead of 1 + cs (round 5).  Only pays at
    # cs >= 3 (see sb_chunk_logits; at cs <= 2 the shrunken stage batch
    # hits the (Bb, 1, X) sublane-padding blowup).
    first = first and cs >= 3
    crows = rows[1:] if first else rows
    ncr = len(crows)
    occ7 = occ_t.astype(dt)[:, :k, :]
    tri = (crows[:, None] > jnp.arange(k)[None, :]).astype(dt)
    occ_b = _occ_context_input(occ7, tri, geom, sm)
    bb = occ_b.shape[0]
    if sm:
        occ_b = jnp.pad(
            occ_b.reshape(bb, ncr, -1, k),
            ((0, 0), (0, 0), (0, 0), (0, ch - k)),
        ).reshape(bb, ncr, -1)
    else:
        occ_b = jnp.pad(occ_b, ((0, 0), (0, 0), (0, ch - k), (0, 0)))
    feat = sb_input_features(params, cfg, geom, level_slices)
    xin = jnp.concatenate([feat, occ_b], axis=1)  # (Bb, 1+ncr, ...)

    st = stack_outer_blocks(params, cfg)
    idx = jnp.clip(crows - 1, 0)
    tk = lambda a: jnp.take(a, idx, axis=0)
    cat = lambda b_leaf, o_rows: jnp.concatenate([b_leaf[None], o_rows], 0)
    bi = params["block_in"]
    cw = jnp.pad(st["conv_in_w"], ((0, 0), (0, 0), (0, ch - k), (0, 0)))
    blk = {
        "conv_in": {
            "w": cat(bi["conv_in"]["w"], tk(cw)),
            "b": cat(bi["conv_in"]["b"], tk(st["conv_in_b"])),
        },
        "irn": jax.tree_util.tree_map(
            lambda b, o: cat(b, tk(o)), bi["irn"], st["irn"]
        ),
        "conv_out": jax.tree_util.tree_map(
            lambda b, o: cat(b, tk(o)), bi["conv_out"], st["conv_out"]
        ),
    }
    out = _sb_block(xin, geom, blk)  # (Bb, 1+ncr, ...)
    x_glob = out[:, :1]
    ctx = out[:, 1:]
    if first:
        ctx_full = jnp.concatenate([x_glob, x_glob + ctx], axis=1)
    else:
        gate = (rows > 0).astype(dt)
        gate = (
            gate[None, :, None] if ctx.ndim == 3
            else gate[None, :, None, None]
        )
        ctx_full = x_glob + gate * ctx

    tr = lambda a: jnp.take(a, rows, axis=0)
    h = sbconv3(ctx_full, geom, tr(params["prune"]["w"]), tr(params["prune"]["b"]))
    logits = _sb_mlp2(
        h,
        geom,
        {"w": tr(params["inner_mlp"]["l0"]["w"]), "b": tr(params["inner_mlp"]["l0"]["b"])},
        {"w": tr(params["inner_mlp"]["l1"]["w"]), "b": tr(params["inner_mlp"]["l1"]["b"])},
    )
    return logits if logits.ndim == 3 else logits[:, :, 0, :]


def sb_fused_chunk_bits(params, cfg: ModelConfig, geom, occ_t, base, cs: int,
                        level_slices, first: bool = False):
    """Masked sum-BCE bits of the ``cs`` stages starting at traced index
    ``base`` through the fused pass (see sb_fused_chunk_logits)."""
    logits = sb_fused_chunk_logits(
        params, cfg, geom, occ_t, base, cs, level_slices, first
    ).astype(F32)
    occ = jax.lax.dynamic_slice_in_dim(occ_t, base, cs, axis=1).astype(F32)
    bce = (
        jnp.maximum(logits, 0.0)
        - logits * occ
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    bce = bce * geom["mask"][:, 0].astype(F32)
    return jnp.sum(bce) / LN2


def sb_chunk_bits(params, cfg: ModelConfig, geom, occ_t, base, cs: int,
                  x_glob):
    """Masked sum-BCE bits of the ``cs`` stages starting at traced index
    ``base`` (see sb_chunk_logits)."""
    logits = sb_chunk_logits(
        params, cfg, geom, occ_t, base, cs, x_glob
    ).astype(F32)
    occ = jax.lax.dynamic_slice_in_dim(occ_t, base, cs, axis=1).astype(F32)
    bce = (
        jnp.maximum(logits, 0.0)
        - logits * occ
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    bce = bce * geom["mask"][:, 0].astype(F32)
    return jnp.sum(bce) / LN2


def sb_training_bits(params, cfg: ModelConfig, geom, occ_t, level_slices,
                     stage_range=None):
    """Masked sum-BCE/ln2 over occupied slots (equals the voxel loss,
    model_core.py:77-80), restricted to ``stage_range``.  The BCE itself
    is always f32."""
    a, b = (0, cfg.outstage) if stage_range is None else stage_range
    logits = sb_forward_all_stages(
        params, cfg, geom, occ_t.astype(geom["dtype"]), level_slices,
        stage_range,
    ).astype(F32)
    occ = occ_t[:, a:b, :].astype(F32)
    bce = (
        jnp.maximum(logits, 0.0)
        - logits * occ
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    bce = bce * geom["mask"][:, 0].astype(F32)
    return jnp.sum(bce) / LN2
