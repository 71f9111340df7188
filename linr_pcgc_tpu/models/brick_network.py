"""Brick-grid implementation of the occupancy network (the TPU hot path).

Same math as models/network.py (verified equal in tests), different data
organization: voxels grouped into 4x4x4 bricks (ops/bricks.py).  Per conv:

  1. *halo exchange*: the 6^3 halo'd neighborhood of every brick is
     assembled as ONE concatenation of 27 fragments — self (64 slots) plus
     26 direction fragments gathered from neighbor bricks (faces 16,
     edges 4, corners 1 slot).  Fragment rows are large (up to 512 B), so
     the gathers run near memory bandwidth instead of the ~6 GB/s of
     per-voxel gathers.  Halo slots are ordered BY SOURCE GROUP, which
     makes assembly a pure concat; the resulting slot permutation is
     folded into the weight matrix statically.
  2. *dense conv as one matmul*: y = halo.(Bb, C*216) @ W2.(C*216, O*64),
     where W2 scatters the 27 x Cin x Cout kernel over the halo slot
     pattern (built at trace time from the canonical (27, Cin, Cout)
     parameters — the same parameter pytree as the gather path).  The MXU
     does 8x redundant work (216 vs 27 halo slots per output), which is
     far cheaper than the HBM traffic it saves.
  3. activations at unoccupied slots are kept exactly zero (masked after
     every conv + bias), which makes the dense convolution equal to the
     reference's submanifold convolution.

The halo exchange has a custom VJP: its transpose is a *fold* — gathers
of the neighbors' halo-gradient fragments — so there is no scatter
anywhere in training (cf. network.py's conv VJP).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .network import ModelConfig, _PREC, F32, LN2, stack_outer_blocks

BRICK = 4
SLOTS = 64
HALO_SIDE = BRICK + 2
HALO_SLOTS = HALO_SIDE**3  # 216

# ---------------------------------------------------------- static tables --

# Directions: index 13 (0,0,0) is "self"; order is lexicographic like the
# conv offset table.
_DIRS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def _axis_src(d):
    # slab of the SOURCE brick contributing to my halo in direction d
    return {(-1): (BRICK - 1, BRICK), 0: (0, BRICK), 1: (0, 1)}[d]


def _fragment_geometry():
    """Per direction: source box slices and flat size; plus the halo-slot
    group layout (start offset of each direction's fragment in the
    concatenated halo axis)."""
    groups = []
    offset = 0
    for d in _DIRS:
        sx, sy, sz = (_axis_src(a) for a in d)
        size = (sx[1] - sx[0]) * (sy[1] - sy[0]) * (sz[1] - sz[0])
        groups.append(dict(d=d, sx=sx, sy=sy, sz=sz, size=size, offset=offset))
        offset += size
    assert offset == HALO_SLOTS
    return groups


_GROUPS = _fragment_geometry()


def _halo_slot_index():
    """Map (hx, hy, hz) in the 6^3 halo -> index in the group-concatenated
    halo axis."""
    table = np.full((HALO_SIDE,) * 3, -1, np.int32)
    for g in _GROUPS:
        d = g["d"]
        # halo coords covered by this group, per axis
        def rng(a):
            return {(-1): range(0, 1), 0: range(1, 1 + BRICK), 1: range(1 + BRICK, HALO_SIDE)}[a]
        pos = 0
        for hx in rng(d[0]):
            for hy in rng(d[1]):
                for hz in rng(d[2]):
                    table[hx, hy, hz] = g["offset"] + pos
                    pos += 1
        assert pos == g["size"]
    assert np.all(table >= 0)
    return table


_HALO_INDEX = _halo_slot_index()


def _selection_tensor():
    """SEL (27, 64, 216): SEL[k, s, h] = 1 if output slot s with conv
    offset k reads group-ordered halo slot h."""
    sel = np.zeros((27, SLOTS, HALO_SLOTS), np.float32)
    for k, (dx, dy, dz) in enumerate(_DIRS):
        for s in range(SLOTS):
            x, y, z = s >> 4, (s >> 2) & 3, s & 3
            h = _HALO_INDEX[x + dx + 1, y + dy + 1, z + dz + 1]
            sel[k, s, h] = 1.0
    return sel


_SEL = jnp.asarray(_selection_tensor())  # (27, 64, 216)


def _halo_row_perm(cin: int) -> np.ndarray:
    """Row permutation mapping (c, h) standard order -> the flat halo's
    (group, c, slot-within-group) lane order (the order halo_exchange
    emits, avoiding any relayout of the big halo tensor)."""
    perm = np.empty(cin * HALO_SLOTS, np.int32)
    r = 0
    for g in _GROUPS:
        for c in range(cin):
            for j in range(g["size"]):
                perm[r] = c * HALO_SLOTS + (g["offset"] + j)
                r += 1
    return perm


_PERM_CACHE = {}


def conv_weight_matrix(w):
    """(27, Cin, Cout) kernel -> (Cin*216, Cout*64) dense brick-conv
    matrix (trace-time einsum over the static selection tensor), with
    rows permuted to the flat halo's (group, c, slot) lane order."""
    cin, cout = w.shape[1], w.shape[2]
    w2 = jnp.einsum("ksh,kco->chos", _SEL, w)  # (Cin, 216, Cout, 64)
    w2 = w2.reshape(cin * HALO_SLOTS, cout * SLOTS)
    if cin not in _PERM_CACHE:
        _PERM_CACHE[cin] = _halo_row_perm(cin)
    return w2[_PERM_CACHE[cin]]


# ------------------------------------------------------------ halo exchange --


def _view5(x):
    # (Bb, C, 64) -> (Bb, C, 4, 4, 4)
    return x.reshape(x.shape[0], x.shape[1], BRICK, BRICK, BRICK)


def _frag_src(x, g):
    sx, sy, sz = g["sx"], g["sy"], g["sz"]
    v = _view5(x)[:, :, sx[0]: sx[1], sy[0]: sy[1], sz[0]: sz[1]]
    return v.reshape(x.shape[0], x.shape[1], g["size"])


def _gather_rows(frag, nbr_col):
    """Gather brick rows of a fragment; -1 (absent) -> zeros."""
    bb = frag.shape[0]
    idx = jnp.where(nbr_col < 0, bb, nbr_col)
    return jnp.take(frag, idx, axis=0, mode="fill", fill_value=0.0)


def _halo_forward(x, nbr27):
    """Returns the FLAT halo (Bb, C*216) in (group, c, slot) lane order —
    concatenating already-flat fragments avoids a relayout of the big
    halo tensor before the conv matmul (whose weight rows are permuted to
    match, see conv_weight_matrix)."""
    bb = x.shape[0]
    parts = []
    for k, g in enumerate(_GROUPS):
        if g["d"] == (0, 0, 0):
            parts.append(x.reshape(bb, -1))
        else:
            parts.append(
                _gather_rows(_frag_src(x, g), nbr27[:, k]).reshape(bb, -1)
            )
    return jnp.concatenate(parts, axis=1)  # (Bb, C*216)


@jax.custom_vjp
def halo_exchange(x, nbr27):
    """(Bb, C, 64), (Bb, 27) -> (Bb, C*216) flat group-ordered halo."""
    return _halo_forward(x, nbr27)


def _halo_fwd(x, nbr27):
    return _halo_forward(x, nbr27), (nbr27, x.shape[1])


def _flat_group(dh, g, cin):
    """Slice group g from the flat (Bb, C*216) halo as (Bb, C, size)."""
    start = 0
    for gg in _GROUPS:
        if gg is g:
            break
        start += cin * gg["size"]
    bb = dh.shape[0]
    return dh[:, start: start + cin * g["size"]].reshape(bb, cin, g["size"])


def _halo_bwd(res, dh):
    """Fold: dx[src_box(d)] += gather(dh[group(-d)], nbr(d)) for each d.

    My fragment src(-d) was shipped to each neighbor at direction d (who
    filed it under group(-d)), so its gradient comes back by gathering
    that group from my d-neighbors.  Pure gathers — no scatter.
    """
    nbr27, cin = res
    bb = dh.shape[0]
    g_self = next(g for g in _GROUPS if g["d"] == (0, 0, 0))
    dx = _flat_group(dh, g_self, cin)
    dx5 = _view5(dx)
    for k, g in enumerate(_GROUPS):
        d = g["d"]
        if d == (0, 0, 0):
            continue
        md = (-d[0], -d[1], -d[2])
        mk = _DIRS.index(md)
        gm = _GROUPS[mk]
        piece = _gather_rows(_flat_group(dh, gm, cin), nbr27[:, k])
        sx, sy, sz = gm["sx"], gm["sy"], gm["sz"]
        piece = piece.reshape(
            bb, cin, sx[1] - sx[0], sy[1] - sy[0], sz[1] - sz[0]
        )
        dx5 = dx5.at[:, :, sx[0]: sx[1], sy[0]: sy[1], sz[0]: sz[1]].add(piece)
    d_nbr = np.zeros(nbr27.shape, dtype=jax.dtypes.float0)
    return dx5.reshape(bb, cin, SLOTS), d_nbr


halo_exchange.defvjp(_halo_fwd, _halo_bwd)


# ------------------------------------------------------------- brick convs --


def _bconv3(x, geom, p):
    """Brick k^3 conv: halo exchange + one dense matmul + bias + slot mask.

    x: (Bb, Cin, 64); geom: dict with 'nbr27' (Bb, 27), 'mask'
    (Bb, 1, 64) float and 'dtype' (compute dtype); p: {'w': (27, Cin,
    Cout), 'b': (Cout,)}.  Mixed precision: activations/halos/matmuls run
    in geom['dtype'] (bf16 halves the gather bytes and runs the MXU at
    full rate), accumulation in f32, output cast back to the compute
    dtype.  The production codec path uses f32 throughout.
    """
    dt = geom.get("dtype", F32)
    bb, cin, _ = x.shape
    cout = p["w"].shape[2]
    halo = halo_exchange(x.astype(dt), geom["nbr27"])  # (Bb, Cin*216) flat
    w2 = conv_weight_matrix(p["w"]).astype(dt)
    prec = _PREC if dt == F32 else jax.lax.Precision.DEFAULT
    # (bf16 path: output in bf16 — the result is cast to dt below anyway,
    # and CPU's dot kernel lacks BF16xBF16->F32)
    acc = F32 if dt == F32 else dt
    y = jnp.dot(halo, w2, precision=prec, preferred_element_type=acc)
    y = y.reshape(bb, cout, SLOTS) + p["b"][None, :, None]
    return (y * geom["mask"]).astype(dt)


def _bconv1(x, geom, p):
    dt = geom.get("dtype", F32)
    prec = _PREC if dt == F32 else jax.lax.Precision.DEFAULT
    acc = F32 if dt == F32 else dt
    y = jnp.einsum(
        "bcs,co->bos", x.astype(dt), p["w"].astype(dt),
        precision=prec, preferred_element_type=acc,
    ) + p["b"][None, :, None]
    return (y * geom["mask"]).astype(dt)


def _brelu(x):
    return jnp.maximum(x, 0.0)


def _birn(x, geom, p):
    out0 = _bconv3(_brelu(_bconv3(x, geom, p["c00"])), geom, p["c01"])
    out1 = _bconv1(
        _brelu(_bconv3(_brelu(_bconv1(x, geom, p["c10"])), geom, p["c11"])),
        geom,
        p["c12"],
    )
    return jnp.concatenate([out0, out1], axis=1) + x


def _bresnet(x, geom, p):
    """resnet.py:88-94: x + conv3(relu(conv3(x)))."""
    return x + _bconv3(_brelu(_bconv3(x, geom, p["r0"])), geom, p["r1"])


def _bblock_core(y, geom, p):
    """ResNetBlock (resnet.py:146-162): stacked cores + outer skip when >1;
    layer kind dispatched on parameter keys (cf. network._block_core)."""
    if "irn" in p:
        return _birn(y, geom, p["irn"])
    out = y
    for lp in p["core"]:
        if "dc0" in lp:
            raise NotImplementedError(
                "DilatedResNet runs on the gather backend only "
                "(cf. models/sb_network._sb_block_core)"
            )
        out = _birn(out, geom, lp) if "c00" in lp else _bresnet(out, geom, lp)
    if len(p["core"]) > 1:
        out = out + y
    return out


def _bblock(x, geom, p):
    y = _brelu(_bconv3(x, geom, p["conv_in"]))
    y = _bblock_core(y, geom, p)
    return _bconv3(y, geom, p["conv_out"])


def _bmlp2(x, geom, l0, l1):
    return _bconv1(_brelu(_bconv1(x, geom, l0)), geom, l1)


# ---------------------------------------------------------------- forward --


def brick_input_features(params, cfg: ModelConfig, geom, level_slices):
    """Per-slot input embedding: per-level scale MLP over
    [scale embedding ++ 7 neighbor-occupancy bit planes].

    Levels are static contiguous segments of the flat brick axis
    (``level_slices``, a static tuple of (start, end)), so per-scale
    weights are selected by static slicing — no gathers (the gather
    path's LUT trick is unnecessary here).
    """
    code = geom["code"]  # (Bb, 64) int32, scale*128 + feat, -1 empty
    feat = code & 127
    bits = jnp.stack(
        [((feat >> k) & 1).astype(F32) for k in range(7)], axis=1
    )  # (Bb, 7, 64)
    bits = bits * geom["mask"]
    parts = []
    for s, (a, b) in enumerate(level_slices):
        seg_geom = dict(mask=geom["mask"][a:b])
        emb = params["scale_emb"][s]  # (emb,)
        seg = jnp.concatenate(
            [
                jnp.broadcast_to(
                    emb[None, :, None], (b - a, emb.shape[0], SLOTS)
                )
                * seg_geom["mask"],
                bits[a:b],
            ],
            axis=1,
        )  # (seg, 15, 64)
        l0 = jax.tree_util.tree_map(lambda x: x[s], params["scale_mlp"]["l0"])
        l1 = jax.tree_util.tree_map(lambda x: x[s], params["scale_mlp"]["l1"])
        parts.append(_bmlp2(seg, seg_geom, l0, l1))
    return jnp.concatenate(parts, axis=0)  # (Bb, ch, 64)


def brick_stage_context(params, cfg: ModelConfig, stage, x_glob, occ7, geom):
    """Traced-stage context; occ7 (Bb, 7, 64) f32 with rows >= stage
    masked here (encoder/decoder symmetry as in network.py)."""
    k = cfg.outstage - 1
    occ_masked = occ7 * (jnp.arange(k) < stage).astype(F32)[None, :, None]
    st = stack_outer_blocks(params, cfg)
    idx = jnp.maximum(stage - 1, 0)
    blk = {
        "conv_in": {"w": st["conv_in_w"][idx], "b": st["conv_in_b"][idx]},
        "irn": jax.tree_util.tree_map(lambda a: a[idx], st["irn"]),
        "conv_out": jax.tree_util.tree_map(lambda a: a[idx], st["conv_out"]),
    }
    ctx = _bblock(occ_masked, geom, blk)
    return x_glob + jnp.where(stage > 0, 1.0, 0.0) * ctx


def brick_stage_head(params, stage, ctx, geom):
    h = _bconv3(
        ctx, geom, {"w": params["prune"]["w"][stage], "b": params["prune"]["b"][stage]}
    )
    l0 = {
        "w": params["inner_mlp"]["l0"]["w"][stage],
        "b": params["inner_mlp"]["l0"]["b"][stage],
    }
    l1 = {
        "w": params["inner_mlp"]["l1"]["w"][stage],
        "b": params["inner_mlp"]["l1"]["b"][stage],
    }
    return _bmlp2(h, geom, l0, l1)[:, 0, :]  # (Bb, 64)


def brick_forward_all_stages(params, cfg: ModelConfig, geom, occ_t, level_slices):
    """Logits (8, Bb, 64).  occ_t: (Bb, 8, 64) float32 ground truth."""
    intensor = brick_input_features(params, cfg, geom, level_slices)
    block_in = jax.checkpoint(lambda p, xi: _bblock(xi, geom, p["block_in"]))
    x_glob = block_in(params, intensor)
    occ7 = occ_t[:, : cfg.outstage - 1, :]

    def body(_, stage):
        def run(p, xg, o7):
            ctx = brick_stage_context(p, cfg, stage, xg, o7, geom)
            return brick_stage_head(p, stage, ctx, geom)

        return None, jax.checkpoint(run)(params, x_glob, occ7)

    _, logits = jax.lax.scan(body, None, jnp.arange(cfg.outstage, dtype=jnp.int32))
    return logits


def brick_training_bits(params, cfg: ModelConfig, geom, occ_t, level_slices):
    """Masked sum-BCE/ln2 over occupied slots (equals the voxel loss).
    The BCE itself is always f32 regardless of the compute dtype."""
    logits = brick_forward_all_stages(
        params, cfg, geom, occ_t, level_slices
    ).astype(F32)
    occ = jnp.moveaxis(occ_t, 1, 0)  # (8, Bb, 64)
    bce = (
        jnp.maximum(logits, 0.0)
        - logits * occ
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    bce = bce * geom["mask"][None, :, 0, :]
    return jnp.sum(bce) / LN2
