"""Superbrick (8^3) sparse-voxel layout: gather granularity for the hot
convolutions, one level above ops/bricks.py's 4^3 compute bricks.

Round-1 measurement: the training step was dominated by gather ROW-RATE
(~50M rows/s on v5e regardless of row bytes below ~2KB).  At 4^3 brick
granularity a halo exchange gathers 26 x n_bricks rows; grouping voxels
into 8^3 *superbricks* cuts the gathered row count 8x while keeping the
MXU matmul at the proven 4^3 granularity:

    (1) halo exchange at 8^3: 26 fragment gathers assemble a 10^3 halo
        per superbrick (8x fewer rows than 4^3, and rows are 2-8KB —
        into the bandwidth-bound regime of the gather unit);
    (2) *sub-halo extraction*: each 10^3 halo'd superbrick contains the
        eight overlapping 6^3 halos of its 4^3 sub-bricks at static
        window offsets {0,4}^3 — extraction is pure strided slicing, no
        gathers; its transpose is a static overlap-add;
    (3) the same (M, C*216) x (C*216, O*64) dense MXU matmul as the 4^3
        backend, with the weight matrix in standard spatial halo order.

Slot index inside a superbrick is ((x&7)<<6) | ((y&7)<<3) | (z&7); brick
order is canonical (lexicographic by brick coordinate).  Construction is
integer-exact pure numpy (host geometry path, once per frame/scale).

Reference semantics covered: MinkowskiConvolution stride-1 submanifold
k^3 conv on fixed output coords (/root/reference/models/upsample.py:13-23
ConvWithPrune; resnet.py throughout) — zero activations at unoccupied
slots keep the dense brick convolution exactly submanifold.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

SB = 8                 # superbrick side
SB_SLOTS = SB**3       # 512
HALO_SIDE = SB + 2     # 10
HALO_VOL = HALO_SIDE**3
SUB = 4                # compute sub-brick side
SUB_SLOTS = SUB**3     # 64
SUB_HALO = SUB + 2     # 6
SUB_HALO_VOL = SUB_HALO**3  # 216

_DIRS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def _np_key(coords: np.ndarray) -> np.ndarray:
    c = coords.astype(np.int64)
    return (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2]


def _np_unkey(keys: np.ndarray) -> np.ndarray:
    m = (1 << 21) - 1
    return np.stack(
        [(keys >> 42) & m, (keys >> 21) & m, keys & m], axis=1
    ).astype(np.int32)


@dataclasses.dataclass
class SuperBrickLevel:
    """One scale's superbrick grid (numpy, trimmed to n_bricks)."""

    brick_coords: np.ndarray  # (Bb, 3) int32, canonical order
    nbr27: np.ndarray         # (Bb, 27) int32 brick-neighbor map, -1 absent
    scale_code: np.ndarray    # (Bb, 512) int32, scale*128+feat_code, -1 empty
    occ: np.ndarray           # (Bb, 8, 512) uint8 ground-truth child occupancy
    voxel_brick: np.ndarray   # (n_vox,) int32 brick index per voxel
    voxel_slot: np.ndarray    # (n_vox,) int32 slot per voxel
    n_vox: int

    @property
    def n_bricks(self) -> int:
        return self.brick_coords.shape[0]


def build_superbrick_level(
    coords: np.ndarray,
    occ: np.ndarray,
    feat_code: np.ndarray,
    scale_idx: int,
) -> SuperBrickLevel:
    """Brickify one level at 8^3.  Inputs are the *trimmed* per-level
    arrays in canonical voxel order: coords (n,3), occ (n,8),
    feat_code (n,)."""
    n = len(coords)
    c = coords.astype(np.int64)
    bkey = _np_key(coords >> 3)
    brick_keys, inv = np.unique(bkey, return_inverse=True)
    bb = len(brick_keys)
    slot = ((c[:, 0] & 7) << 6) | ((c[:, 1] & 7) << 3) | (c[:, 2] & 7)
    slot = slot.astype(np.int32)

    scale_code = np.full((bb, SB_SLOTS), -1, np.int32)
    scale_code[inv, slot] = scale_idx * 128 + feat_code.astype(np.int32)
    occ_b = np.zeros((bb, 8, SB_SLOTS), np.uint8)
    occ_b[inv, :, slot] = occ.astype(np.uint8)

    brick_coords = _np_unkey(brick_keys)
    r = np.asarray(_DIRS, np.int64)
    q = brick_coords[:, None, :].astype(np.int64) + r[None, :, :]
    valid = np.all(q >= 0, axis=2)
    qkey = (q[:, :, 0] << 42) | (q[:, :, 1] << 21) | q[:, :, 2]
    pos = np.searchsorted(brick_keys, qkey)
    pos_c = np.minimum(pos, bb - 1)
    hit = (brick_keys[pos_c] == qkey) & valid
    nbr = np.where(hit, pos_c, -1).astype(np.int32)

    return SuperBrickLevel(
        brick_coords=brick_coords,
        nbr27=nbr,
        scale_code=scale_code,
        occ=occ_b,
        voxel_brick=inv.astype(np.int32),
        voxel_slot=slot,
        n_vox=n,
    )


# ----------------------------------------------------------- halo exchange --

def _src_range(d: int) -> tuple[int, int]:
    """Slab of the SOURCE (neighbor) brick contributing to my halo in
    direction component d (per axis)."""
    return {(-1): (SB - 1, SB), 0: (0, SB), 1: (0, 1)}[d]


def _dst_range(d: int) -> tuple[int, int]:
    """Destination window in my 10^3 halo (per axis)."""
    return {(-1): (0, 1), 0: (1, 1 + SB), 1: (1 + SB, HALO_SIDE)}[d]


def _gather_rows(frag, nbr_col):
    """Gather brick rows of a fragment along axis 0; -1 (absent) -> zeros."""
    bb = frag.shape[0]
    idx = jnp.where(nbr_col < 0, bb, nbr_col)
    return jnp.take(frag, idx, axis=0, mode="fill", fill_value=0.0)


def _halo_forward(x, nbr27):
    """x (Bb, C, 512) -> (Bb, C, 10, 10, 10) spatial halo.

    26 fragment gathers (one per direction) + nested z/y/x concatenation
    (pure relayout, fused by XLA).  Absent neighbors contribute zeros.
    """
    bb, c, _ = x.shape
    xv = x.reshape(bb, c, SB, SB, SB)

    def frag(d):
        dx, dy, dz = d
        if d == (0, 0, 0):
            return xv
        sx, sy, sz = _src_range(dx), _src_range(dy), _src_range(dz)
        piece = xv[:, :, sx[0]: sx[1], sy[0]: sy[1], sz[0]: sz[1]]
        k = _DIRS.index(d)
        return _gather_rows(piece, nbr27[:, k])

    planes = []
    for dx in (-1, 0, 1):
        strips = []
        for dy in (-1, 0, 1):
            strips.append(
                jnp.concatenate(
                    [frag((dx, dy, dz)) for dz in (-1, 0, 1)], axis=4
                )
            )
        planes.append(jnp.concatenate(strips, axis=3))
    return jnp.concatenate(planes, axis=2)


@jax.custom_vjp
def sb_halo(x, nbr27):
    """(Bb, C, 512), (Bb, 27) -> (Bb, C, 10, 10, 10) spatial halo."""
    return _halo_forward(x, nbr27)


def _sb_halo_fwd(x, nbr27):
    return _halo_forward(x, nbr27), nbr27


def _sb_halo_bwd(nbr27, dh):
    """Scatter-free fold: my slab src(d) was shipped to neighbor nbr(b,-d)
    who filed it at halo window dst(d); its gradient returns by a gather
    of that window over the -d neighbor map.  26 gathers + static
    overlap-adds — no scatter anywhere (cf. ops/bricks._halo_bwd)."""
    bb = dh.shape[0]
    dx_v = dh[:, :, 1: 1 + SB, 1: 1 + SB, 1: 1 + SB]
    for d in _DIRS:
        if d == (0, 0, 0):
            continue
        ddx, ddy, ddz = d
        md = (-ddx, -ddy, -ddz)
        mk = _DIRS.index(md)
        wx, wy, wz = _dst_range(ddx), _dst_range(ddy), _dst_range(ddz)
        piece = _gather_rows(
            dh[:, :, wx[0]: wx[1], wy[0]: wy[1], wz[0]: wz[1]],
            nbr27[:, mk],
        )
        sx, sy, sz = _src_range(ddx), _src_range(ddy), _src_range(ddz)
        dx_v = dx_v.at[:, :, sx[0]: sx[1], sy[0]: sy[1], sz[0]: sz[1]].add(piece)
    d_nbr = np.zeros(nbr27.shape, dtype=jax.dtypes.float0)
    return dx_v.reshape(bb, dx_v.shape[1], SB_SLOTS), d_nbr


sb_halo.defvjp(_sb_halo_fwd, _sb_halo_bwd)


# ------------------------------------------------- sub-halo extraction + W --

# The eight 4^3 sub-bricks sit at offsets {0,4}^3 inside the 8^3 brick;
# each one's 6^3 halo is the static window [o, o+6) of the 10^3 halo.
SUB_OFFSETS = [(i, j, k) for i in (0, SUB) for j in (0, SUB) for k in (0, SUB)]


def sb_extract(h):
    """(Bb, C, 10, 10, 10) -> (8, Bb, C, 216): the eight sub-brick 6^3
    halos, spatial (z-major) slot order.  Pure static strided slicing —
    autodiff gives the exact overlap-add transpose with static indices
    (lowered to pads, no scatters)."""
    bb, c = h.shape[0], h.shape[1]
    subs = [
        h[:, :, i: i + SUB_HALO, j: j + SUB_HALO, k: k + SUB_HALO].reshape(
            bb, c, SUB_HALO_VOL
        )
        for (i, j, k) in SUB_OFFSETS
    ]
    return jnp.stack(subs, axis=0)


def _sub_sel_tensor():
    """SEL (27, 64, 216) in STANDARD spatial order: SEL[k, s, h] = 1 if
    output slot s (4^3, z-major) with conv offset k reads 6^3 halo slot h
    (z-major)."""
    sel = np.zeros((27, SUB_SLOTS, SUB_HALO_VOL), np.float32)
    for k, (dx, dy, dz) in enumerate(_DIRS):
        for s in range(SUB_SLOTS):
            x, y, z = s >> 4, (s >> 2) & 3, s & 3
            h = (
                (x + dx + 1) * SUB_HALO * SUB_HALO
                + (y + dy + 1) * SUB_HALO
                + (z + dz + 1)
            )
            sel[k, s, h] = 1.0
    return sel


_SEL_STD = jnp.asarray(_sub_sel_tensor())  # (27, 64, 216)


def sb_conv_weight_matrix(w):
    """(..., 27, Cin, Cout) canonical kernel -> (..., Cin*216, Cout*64)
    dense sub-brick conv matrix in standard spatial halo order (matches
    sb_extract's flattening).  Leading axes (e.g. a stage batch) are
    preserved.  Built at trace time; gradients flow through."""
    cin, cout = w.shape[-2], w.shape[-1]
    w2 = jnp.einsum("ksh,...kco->...chos", _SEL_STD, w)
    return w2.reshape(*w.shape[:-3], cin * SUB_HALO_VOL, cout * SUB_SLOTS)


def sb_scatter_out(y, bb):
    """(8, Bb, Cout, 64) sub-brick outputs -> (Bb, Cout, 512) superbrick
    slots.  Sub p=(i,j,k in {0,4}) slot (x4,y4,z4) maps to superbrick slot
    ((i+x4)<<6)|((j+y4)<<3)|(k+z4): a static transpose/reshape."""
    cout = y.shape[2]
    # (2,2,2, Bb, Cout, 4,4,4) -> (Bb, Cout, 2,4, 2,4, 2,4)
    y8 = y.reshape(2, 2, 2, bb, cout, SUB, SUB, SUB)
    y8 = jnp.transpose(y8, (3, 4, 0, 5, 1, 6, 2, 7))
    return y8.reshape(bb, cout, SB_SLOTS)
