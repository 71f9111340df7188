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
import functools
import os

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


def unpack_bits(packed):
    """(..., n/8) uint8 -> (..., n) {0,1} uint8 (numpy packbits 'big'
    order).  The occupancy ground truth crosses host->device and sits in
    HBM bit-packed (8x smaller); consumers unpack in-jit (pure VPU)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)


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
    side: int = 8,
) -> SuperBrickLevel:
    """Brickify one level at side^3 (8 or 4).  Inputs are the *trimmed*
    per-level arrays in canonical voxel order: coords (n,3), occ (n,8),
    feat_code (n,)."""
    n = len(coords)
    c = coords.astype(np.int64)
    shift = side.bit_length() - 1
    m = side - 1
    slots = side**3
    bkey = _np_key(coords >> shift)
    brick_keys, inv = np.unique(bkey, return_inverse=True)
    bb = len(brick_keys)
    slot = (
        ((c[:, 0] & m) << (2 * shift)) | ((c[:, 1] & m) << shift) | (c[:, 2] & m)
    )
    slot = slot.astype(np.int32)

    scale_code = np.full((bb, slots), -1, np.int32)
    scale_code[inv, slot] = scale_idx * 128 + feat_code.astype(np.int32)
    occ_b = np.zeros((bb, 8, slots), np.uint8)
    occ_b[inv, :, slot] = occ.astype(np.uint8)

    brick_coords = _np_unkey(brick_keys)
    # Neighbor keys by direct key arithmetic: key(c + d) = key(c) +
    # (dx<<42 | dy<<21 | dz) — no (Bb, 27, 3) coordinate temp.  A border
    # underflow (coordinate 0 stepping to -1) borrows into the next
    # field, producing a key whose coordinate is ~2^21 (or negative for
    # x): no such brick exists at real coordinate ranges (<= 2^18 bricks
    # per axis for 20-bit clouds), so the exact-match test below yields
    # -1, exactly like an explicit bounds check.
    doff = np.asarray(
        [(dx << 42) + (dy << 21) + dz for (dx, dy, dz) in _DIRS], np.int64
    )
    qkey = brick_keys[:, None] + doff[None, :]
    # int32 positions + np.take: ~1.5x faster than int64 fancy-index +
    # np.where on this class of host (measured scripts/prof_assemble.py)
    pos = np.searchsorted(brick_keys, qkey).astype(np.int32)
    np.minimum(pos, np.int32(bb - 1), out=pos)
    hit = np.take(brick_keys, pos) == qkey
    nbr = np.where(hit, pos, np.int32(-1))

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
#
# TPU layout law: XLA tiles the LAST TWO dims to (8, 128), so any tensor
# whose minor dims are spatial (10, 10) or (8, 8) materializes with an
# 8-16x padding blow-up (measured: a 625 MB halo costing 7.8 GB).  The
# halo therefore NEVER takes a >4-D shape.  Representation:
#
#     halo h: (Bb, C, 10, 100)
#       axis 2: the 10 x-planes [from -x nbr | own 8 | from +x nbr]
#       axis 3: GROUP-ORDERED yz slots of one plane:
#         [  0,  64)  center 8x8, (y-1)*8 + (z-1) at spatial (y, z)
#         [ 64,  72)  y=0 row (from the -y side), z spatial 1..8
#         [ 72,  80)  y=9 row (+y side),          z spatial 1..8
#         [ 80,  88)  z=0 col (-z side),          y spatial 1..8
#         [ 88,  96)  z=9 col (+z side),          y spatial 1..8
#         [ 96, 100)  corners (y,z) = (0,0), (0,9), (9,0), (9,9)
#
# Every direction's fragment is then a rectangular (x-range, col-range)
# block: assembly is pure concatenation with minor dims (10 -> 16,
# 100 -> 128), a 2.05x worst-case pad instead of 13-16x.  The spatial
# un-permutation is folded into the (100, 36) sub-halo selection matmuls
# (sb_yz_select), which feed the conv weight matrix's standard order.

# destination column range in the 100-axis per (dy, dz)
_YZ_DST = {
    (0, 0): (0, 64),
    (-1, 0): (64, 72),
    (1, 0): (72, 80),
    (0, -1): (80, 88),
    (0, 1): (88, 96),
    (-1, -1): (96, 97),
    (-1, 1): (97, 98),
    (1, -1): (98, 99),
    (1, 1): (99, 100),
}
_YZ_ORDER = list(_YZ_DST.keys())  # concat order along axis 3

# destination x-plane range per dx
_X_DST = {-1: (0, 1), 0: (1, 1 + SB), 1: (1 + SB, HALO_SIDE)}
# source x-plane slab (of the neighbor) per dx
_X_SRC = {-1: (SB - 1, SB), 0: (0, SB), 1: (0, 1)}


def _yz_cols(slab, dy, dz):
    """Select the source yz columns of a (Bb, C, px, 64) plane slab that a
    (dy, dz) neighbor ships: contiguous or strided slices of the 64-col
    axis (64 = y*8 + z)."""
    if (dy, dz) == (0, 0):
        return slab
    if (dy, dz) == (-1, 0):
        return slab[..., 56:64]   # its y=7 row
    if (dy, dz) == (1, 0):
        return slab[..., 0:8]     # its y=0 row
    if (dy, dz) == (0, -1):
        return slab[..., 7::8]    # its z=7 col
    if (dy, dz) == (0, 1):
        return slab[..., 0::8]    # its z=0 col
    if (dy, dz) == (-1, -1):
        return slab[..., 63:64]
    if (dy, dz) == (-1, 1):
        return slab[..., 56:57]
    if (dy, dz) == (1, -1):
        return slab[..., 7:8]
    return slab[..., 0:1]


def _yz_src_pad(dy, dz, piece):
    """Inverse of _yz_cols: zero-pad a gathered gradient piece back to the
    (.., px, 64) source slab position (interior padding realizes the
    stride-8 z columns — no scatter)."""
    w = piece.shape[-1]
    if (dy, dz) == (0, 0):
        return piece
    pads = {
        (-1, 0): (56, 0, 0),
        (1, 0): (0, 56, 0),
        (0, -1): (7, 0, 7),
        (0, 1): (0, 7, 7),
        (-1, -1): (63, 0, 0),
        (-1, 1): (56, 7, 0),
        (1, -1): (7, 56, 0),
        (1, 1): (0, 63, 0),
    }[(dy, dz)]
    cfg = [(0, 0, 0)] * (piece.ndim - 1) + [pads]
    out = jax.lax.pad(piece, jnp.zeros((), piece.dtype), cfg)
    assert out.shape[-1] == 64, (w, pads, out.shape)
    return out


def _gather_rows(frag, nbr_col):
    """Gather brick rows of a fragment along axis 0; -1 (absent) -> zeros."""
    bb = frag.shape[0]
    idx = jnp.where(nbr_col < 0, bb, nbr_col)
    return jnp.take(frag, idx, axis=0, mode="fill", fill_value=0.0)


def _halo_forward(x, nbr27):
    """x (Bb, C, 512) -> (Bb, C, 10, 100) group-ordered halo.

    27 rectangular fragments (slice -> gather) + two levels of
    concatenation; absent neighbors contribute zeros.
    """
    bb, c, _ = x.shape
    xv = x.reshape(bb, c, SB, 64)

    def piece(d):
        dx, dy, dz = d
        sx = _X_SRC[dx]
        cols = _yz_cols(xv[:, :, sx[0]: sx[1], :], dy, dz)
        if d == (0, 0, 0):
            return cols
        return _gather_rows(cols, nbr27[:, _DIRS.index(d)])

    groups = [
        jnp.concatenate([piece((dx, dy, dz)) for (dy, dz) in _YZ_ORDER], axis=3)
        for dx in (-1, 0, 1)
    ]
    return jnp.concatenate(groups, axis=2)  # (Bb, C, 10, 100)


@jax.custom_vjp
def sb_halo(x, nbr27):
    """(Bb, C, 512), (Bb, 27) -> (Bb, C, 10, 100) group-ordered halo."""
    return _halo_forward(x, nbr27)


def _sb_halo_fwd(x, nbr27):
    return _halo_forward(x, nbr27), nbr27


def _sb_halo_bwd(nbr27, dh):
    """Scatter-free fold: brick b's slab for direction d was shipped to
    the brick at -d, filed at window (x_dst(d), yz_dst(d)); its gradient
    returns by gathering that window over the -d neighbor map and
    zero-padding back to the source slab (interior pads realize strided
    columns).  No scatter anywhere; all shapes <= 4-D."""
    bb, c = dh.shape[0], dh.shape[1]
    # materialize the incoming halo cotangent once: its producer is the
    # transposed extraction einsum, and letting XLA fuse that into the 26
    # window gathers below recomputes it per direction (see the matching
    # barrier in sb_network.sbconv3)
    dh = jax.lax.optimization_barrier(dh)
    g0, g1 = _YZ_DST[(0, 0)]
    total = dh[:, :, 1: 1 + SB, g0:g1]
    for d in _DIRS:
        if d == (0, 0, 0):
            continue
        dx, dy, dz = d
        mk = _DIRS.index((-dx, -dy, -dz))
        x0, x1 = _X_DST[dx]
        c0, c1 = _YZ_DST[(dy, dz)]
        piece = _gather_rows(dh[:, :, x0:x1, c0:c1], nbr27[:, mk])
        piece = _yz_src_pad(dy, dz, piece)
        s0, s1 = _X_SRC[dx]
        cfg = [(0, 0, 0), (0, 0, 0), (s0, SB - s1, 0), (0, 0, 0)]
        total = total + jax.lax.pad(piece, jnp.zeros((), piece.dtype), cfg)
    d_nbr = np.zeros(nbr27.shape, dtype=jax.dtypes.float0)
    return total.reshape(bb, c, SB_SLOTS), d_nbr


sb_halo.defvjp(_sb_halo_fwd, _sb_halo_bwd)


def halo_group_to_spatial(h: np.ndarray) -> np.ndarray:
    """Test/debug helper: (Bb, C, 10, 100) group-ordered halo -> dense
    (Bb, C, 10, 10, 10) spatial halo (numpy)."""
    bb, c = h.shape[0], h.shape[1]
    out = np.zeros((bb, c, HALO_SIDE, HALO_SIDE, HALO_SIDE), h.dtype)
    for y in range(HALO_SIDE):
        for z in range(HALO_SIDE):
            out[:, :, :, y, z] = h[:, :, :, _yz_group_slot(y, z)]
    return out


def _yz_group_slot(y: int, z: int) -> int:
    """Spatial (y, z) in [0, 10)^2 -> group-ordered column in [0, 100)."""
    if 1 <= y <= 8 and 1 <= z <= 8:
        return (y - 1) * 8 + (z - 1)
    if y == 0 and 1 <= z <= 8:
        return 64 + (z - 1)
    if y == 9 and 1 <= z <= 8:
        return 72 + (z - 1)
    if z == 0 and 1 <= y <= 8:
        return 80 + (y - 1)
    if z == 9 and 1 <= y <= 8:
        return 88 + (y - 1)
    return 96 + {(0, 0): 0, (0, 9): 1, (9, 0): 2, (9, 9): 3}[(y, z)]


def _yz_select_matrix(py: int, pz: int) -> np.ndarray:
    """(100, 36) selector: group-ordered yz columns -> the 6x6 (y, z)
    window at offset (py, pz), flattened wy*6 + wz (the conv weight
    matrix's spatial order)."""
    m = np.zeros((100, 36), np.float32)
    for wy in range(SUB_HALO):
        for wz in range(SUB_HALO):
            m[_yz_group_slot(py + wy, pz + wz), wy * SUB_HALO + wz] = 1.0
    return m


# one (100, 36) selector per (py, pz) sub-offset in {0, 4}^2
_YZ_SELECT = {
    (j, k): jnp.asarray(_yz_select_matrix(j, k))
    for j in (0, SUB)
    for k in (0, SUB)
}


def sb_yz_select(hx, j: int, k: int):
    """(Bb, C, 6, 100) x-sliced halo -> (Bb, C, 6, 36): the (y, z) window
    at offset (j, k), via a tiny selection matmul (layout-clean: no
    spatial minor dims are ever materialized)."""
    sel = _YZ_SELECT[(j, k)].astype(hx.dtype)
    return jnp.einsum("bcxg,gw->bcxw", hx, sel)


# ------------------------------------------------ 4^3 bricks, flat halo --
#
# The 8^3 layout amortizes gather rows but pays a measured ~65 ms/conv to
# extract its eight 6^3 sub-halos (every formulation — slicing einsums,
# minor-axis takes, selection dots — is bandwidth-bound on re-reading the
# padded halo).  At 4^3 the brick IS the compute tile: the halo IS the
# conv matmul operand, with the un-permutation folded into the weight
# matrix.  Occupancy is also ~2x better (fewer empty slots on thin
# surfaces), shrinking every tensor.
#
# Flat halo layout (Bb, C, 216), F = plane*36 + g:
#   plane: the 6 x-planes [from -x nbr | own 4 | from +x nbr]
#   g: group-ordered yz columns of one plane:
#     [ 0, 16)  center 4x4, (y-1)*4 + (z-1) at spatial (y, z)
#     [16, 20)  y=0 row (-y side), z spatial 1..4
#     [20, 24)  y=5 row (+y side), z spatial 1..4
#     [24, 28)  z=0 col (-z side), y spatial 1..4
#     [28, 32)  z=5 col (+z side), y spatial 1..4
#     [32, 36)  corners (y,z) = (0,0), (0,5), (5,0), (5,5)
#
# Everything is 3-D with minor dims {16..216} -> lane pads <= 2x; the
# assembly is two levels of minor-axis concatenation.

B4 = 4
B4_SLOTS = 64
B4_HALO = 6            # halo planes per axis
B4_PLANE = 36          # group-ordered yz columns per plane
B4_HALO_VOL = 216

_B4_X_SRC = {-1: (B4 - 1, B4), 0: (0, B4), 1: (0, 1)}
_B4_X_DST = {-1: (0, 1), 0: (1, 1 + B4), 1: (1 + B4, B4_HALO)}


def _b4_group_slot(y: int, z: int) -> int:
    """Spatial (y, z) in [0, 6)^2 -> group-ordered column in [0, 36)."""
    if 1 <= y <= 4 and 1 <= z <= 4:
        return (y - 1) * 4 + (z - 1)
    if y == 0 and 1 <= z <= 4:
        return 16 + (z - 1)
    if y == 5 and 1 <= z <= 4:
        return 20 + (z - 1)
    if z == 0 and 1 <= y <= 4:
        return 24 + (y - 1)
    if z == 5 and 1 <= y <= 4:
        return 28 + (y - 1)
    return 32 + {(0, 0): 0, (0, 5): 1, (5, 0): 2, (5, 5): 3}[(y, z)]


# destination column range within a plane's 36, per (dy, dz)
_B4_YZ_DST = {
    (0, 0): (0, 16),
    (-1, 0): (16, 20),
    (1, 0): (20, 24),
    (0, -1): (24, 28),
    (0, 1): (28, 32),
    (-1, -1): (32, 33),
    (-1, 1): (33, 34),
    (1, -1): (34, 35),
    (1, 1): (35, 36),
}


def _b4_yz_cols(slab, dy, dz):
    """Source yz columns (of a (Bb, C, px, 16) plane slab, 16 = y*4+z)
    that a (dy, dz) neighbor ships."""
    if (dy, dz) == (0, 0):
        return slab
    if (dy, dz) == (-1, 0):
        return slab[..., 12:16]   # its y=3 row
    if (dy, dz) == (1, 0):
        return slab[..., 0:4]     # its y=0 row
    if (dy, dz) == (0, -1):
        return slab[..., 3::4]    # its z=3 col
    if (dy, dz) == (0, 1):
        return slab[..., 0::4]    # its z=0 col
    if (dy, dz) == (-1, -1):
        return slab[..., 15:16]
    if (dy, dz) == (-1, 1):
        return slab[..., 12:13]
    if (dy, dz) == (1, -1):
        return slab[..., 3:4]
    return slab[..., 0:1]


def _b4_yz_src_pad(dy, dz, piece):
    """Inverse of _b4_yz_cols: zero-pad a gradient piece back to 16 source
    columns (interior padding realizes the stride-4 z columns)."""
    if (dy, dz) == (0, 0):
        return piece
    pads = {
        (-1, 0): (12, 0, 0),
        (1, 0): (0, 12, 0),
        (0, -1): (3, 0, 3),
        (0, 1): (0, 3, 3),
        (-1, -1): (15, 0, 0),
        (-1, 1): (12, 3, 0),
        (1, -1): (3, 12, 0),
        (1, 1): (0, 15, 0),
    }[(dy, dz)]
    cfg = [(0, 0, 0)] * (piece.ndim - 1) + [pads]
    out = jax.lax.pad(piece, jnp.zeros((), piece.dtype), cfg)
    assert out.shape[-1] == 16, (pads, out.shape)
    return out


def _b4_halo_forward(x, nbr27):
    """x (Bb, C, 64) -> (Bb, C, 216) flat group-ordered halo.

    Fragment discipline: a gather operand materializes, and a 4-D
    (Bb, C, px<=4, w<=16) fragment tiles to (8, 128) — a measured 16x
    padding blow-up that made the naive formulation ~117 ms at level-0
    shapes.  Each fragment is therefore flattened to (Bb, C*px*w) (minor
    512-2048, ~unpadded) before the gather; the assembly reads it back
    through a reshape view inside the concat fusion.
    """
    bb, c, _ = x.shape
    xv = x.reshape(bb, c, B4, 16)

    frags = {}
    for d in _DIRS:
        dx, dy, dz = d
        sx = _B4_X_SRC[dx]
        cols = _b4_yz_cols(xv[:, :, sx[0]: sx[1], :], dy, dz)
        if d == (0, 0, 0):
            frags[d] = cols
        else:
            px, w = cols.shape[2], cols.shape[3]
            flat = cols.reshape(bb, c * px * w)
            g = _gather_rows(flat, nbr27[:, _DIRS.index(d)])
            frags[d] = g.reshape(bb, c, px, w)

    planes = []
    for hp in range(B4_HALO):
        dx = -1 if hp == 0 else (1 if hp == B4_HALO - 1 else 0)
        sp = 0 if dx != 0 else hp - 1  # index within the fragment's px axis
        planes.append(
            jnp.concatenate(
                [frags[(dx, dy, dz)][:, :, sp, :] for (dy, dz) in _YZ_ORDER],
                axis=2,
            )
        )
    return jnp.concatenate(planes, axis=2)  # (Bb, C, 216)


@jax.custom_vjp
def b4_halo(x, nbr27):
    """(Bb, C, 64), (Bb, 27) -> (Bb, C, 216) flat group-ordered halo."""
    return _b4_halo_forward(x, nbr27)


def _b4_halo_fwd(x, nbr27):
    return _b4_halo_forward(x, nbr27), nbr27


def _b4_halo_bwd(nbr27, dh):
    """Scatter-free fold on the flat 216 layout: per direction, gather the
    destination window over the -d map, zero-pad to source columns, and
    accumulate per source x-plane; the plane sums concatenate back to the
    flat 64.  Everything 3-D (transient 4-D stacks only feed gathers)."""
    bb, c = dh.shape[0], dh.shape[1]
    dh = jax.lax.optimization_barrier(dh)
    # per-source-plane accumulators, each (Bb, C, 16)
    g0, g1 = _B4_YZ_DST[(0, 0)]
    acc = [
        dh[:, :, (1 + q) * B4_PLANE + g0: (1 + q) * B4_PLANE + g1]
        for q in range(B4)
    ]
    for d in _DIRS:
        if d == (0, 0, 0):
            continue
        dx, dy, dz = d
        mk = _DIRS.index((-dx, -dy, -dz))
        x0, x1 = _B4_X_DST[dx]
        c0, c1 = _B4_YZ_DST[(dy, dz)]
        px, w = x1 - x0, c1 - c0
        window = jnp.concatenate(
            [
                dh[:, :, p * B4_PLANE + c0: p * B4_PLANE + c1]
                for p in range(x0, x1)
            ],
            axis=2,
        ).reshape(bb, c * px * w)  # flat: gather operands must not be
        # small-minor 4-D (16x tile padding, see _b4_halo_forward)
        piece = _gather_rows(window, nbr27[:, mk]).reshape(bb, c, px, w)
        piece = _b4_yz_src_pad(dy, dz, piece)  # (Bb, C, px, 16)
        s0, _ = _B4_X_SRC[dx]
        for q in range(piece.shape[2]):
            acc[s0 + q] = acc[s0 + q] + piece[:, :, q, :]
    d_nbr = np.zeros(nbr27.shape, dtype=jax.dtypes.float0)
    return jnp.concatenate(acc, axis=2), d_nbr


b4_halo.defvjp(_b4_halo_fwd, _b4_halo_bwd)


# --------------------------------------- 4^3 bricks, SLOT-MAJOR layout --
#
# Round-3 measurement (scripts/prof_flat2.py, 36864 bricks, SC=32):
# the channel-major halo truly costs ~16.6 ms fully consumed and ~23 ms
# composed with its matmul, because the gathered fragments interleave
# channels with 4-16-wide spatial runs (strided assembly writes) and the
# (Bb, SC, 216) -> (Bb, S, C*216) operand view relayouts.  Assembling the
# halo CHANNEL-MINOR — activations (Bb, S, 64*C), slot-major with the C
# channels contiguous per slot — makes every fragment a contiguous
# slot-run, the assembly a pure minor-axis concat, and the concat output
# (Bb, S, 216*C) IS the conv matmul operand (weight permutation folded at
# trace time): measured 7.2 ms halo+matmul, 3.2x faster, numerically
# identical.  This is the production layout for side=4; the 8^3 path
# keeps the channel-major form.


def _b4_yz_cols_sm(slab, dy, dz):
    """Slot-major twin of _b4_yz_cols: slab (Bb, S, px, 16, c); the yz
    selection slices axis -2 (16 = y*4 + z), channels stay minor."""
    if (dy, dz) == (0, 0):
        return slab
    if (dy, dz) == (-1, 0):
        return slab[..., 12:16, :]
    if (dy, dz) == (1, 0):
        return slab[..., 0:4, :]
    if (dy, dz) == (0, -1):
        return slab[..., 3::4, :]
    if (dy, dz) == (0, 1):
        return slab[..., 0::4, :]
    if (dy, dz) == (-1, -1):
        return slab[..., 15:16, :]
    if (dy, dz) == (-1, 1):
        return slab[..., 12:13, :]
    if (dy, dz) == (1, -1):
        return slab[..., 3:4, :]
    return slab[..., 0:1, :]


def _b4_yz_src_pad_sm(dy, dz, piece):
    """Inverse of _b4_yz_cols_sm: zero-pad a gradient piece back to 16
    source yz columns on axis -2 (interior pads realize the stride-4 z
    columns)."""
    if (dy, dz) == (0, 0):
        return piece
    pads = {
        (-1, 0): (12, 0, 0),
        (1, 0): (0, 12, 0),
        (0, -1): (3, 0, 3),
        (0, 1): (0, 3, 3),
        (-1, -1): (15, 0, 0),
        (-1, 1): (12, 3, 0),
        (1, -1): (3, 12, 0),
        (1, 1): (0, 15, 0),
    }[(dy, dz)]
    cfg = [(0, 0, 0)] * (piece.ndim - 2) + [pads, (0, 0, 0)]
    out = jax.lax.pad(piece, jnp.zeros((), piece.dtype), cfg)
    assert out.shape[-2] == 16, (pads, out.shape)
    return out


def _b4_halo_sm_forward(x, nbr27):
    """x (Bb, S, 64*C) slot-major -> (Bb, S, 216*C) channel-minor halo.

    Fragments are contiguous slot-runs (channels minor), flattened to
    (Bb, S*px*w*C) before the gather (operand discipline), and the
    two-level concat emits halo columns in (plane*36 + group)*C + c
    order — exactly the rows of b4_conv_weight_matrix_sm.

    Gather-op merging (round 5, MEASURED AND REJECTED — default off):
    shipping the 12 edge + 8 corner fragments through ONE padded gather
    (a (20*Bb, S*4*C) stacked operand) was built on the hypothesis that
    their 20 gather ops were fixed overhead; measured at level-0 codec
    shapes (cs=2) it is 2.4x SLOWER (38.7 vs 16.2 ms per probs dispatch,
    scripts/prof_probs.py) — the major-axis operand concat costs more
    than the small gathers it saves.  Kept env-gated
    (LINR_HALO_MERGE=1) as a reproducible negative result; halo VALUES
    are identical in both modes."""
    bb, s, vc = x.shape
    c = vc // B4_SLOTS
    xv = x.reshape(bb, s, B4, 16, c)

    merge = os.environ.get("LINR_HALO_MERGE", "0") == "1"
    smalls = [
        d for d in _DIRS
        if merge and d != (0, 0, 0) and sum(v != 0 for v in d) >= 2
    ]
    frags = {}
    small_pieces = []
    for d in _DIRS:
        dx, dy, dz = d
        sx = _B4_X_SRC[dx]
        pc = _b4_yz_cols_sm(xv[:, :, sx[0]: sx[1]], dy, dz)
        px, wd = pc.shape[2], pc.shape[3]
        if d == (0, 0, 0):
            frags[d] = pc.reshape(bb, s, px, wd * c)
        elif d in smalls:
            flat = pc.reshape(bb, s, px * wd * c)
            if px * wd < 4:  # corners: pad to the uniform 4-slot row
                flat = jnp.pad(
                    flat, ((0, 0), (0, 0), (0, (4 - px * wd) * c))
                )
            small_pieces.append(flat.reshape(bb, s * 4 * c))
        else:
            flat = pc.reshape(bb, s * px * wd * c)
            g = _gather_rows(flat, nbr27[:, _DIRS.index(d)])
            frags[d] = g.reshape(bb, s, px, wd * c)

    if smalls:
        # one padded gather for all 20 small fragments
        op = jnp.concatenate(small_pieces, axis=0)  # (20*Bb, S*4*C)
        nbr_small = jnp.stack(
            [nbr27[:, _DIRS.index(d)] for d in smalls], axis=0
        )  # (20, Bb)
        base = (jnp.arange(len(smalls), dtype=jnp.int32) * bb)[:, None]
        idx = jnp.where(nbr_small >= 0, nbr_small + base, len(smalls) * bb)
        g_small = jnp.take(
            op, idx.reshape(-1), axis=0, mode="fill", fill_value=0.0
        ).reshape(len(smalls), bb, s, 4 * c)
        for k, d in enumerate(smalls):
            dx, dy, dz = d
            px = _B4_X_SRC[dx][1] - _B4_X_SRC[dx][0]
            wd = len(_YZ_SHIP[(dy, dz)])
            piece = g_small[k][:, :, : px * wd * c]
            frags[d] = piece.reshape(bb, s, px, wd * c)

    planes = []
    for hp in range(B4_HALO):
        dx = -1 if hp == 0 else (1 if hp == B4_HALO - 1 else 0)
        sp = 0 if dx != 0 else hp - 1
        planes.append(
            jnp.concatenate(
                [frags[(dx, dy, dz)][:, :, sp, :] for (dy, dz) in _YZ_ORDER],
                axis=2,
            )
        )
    return jnp.concatenate(planes, axis=2)  # (Bb, S, 216*C)


@jax.custom_vjp
def b4_halo_sm(x, nbr27):
    """(Bb, S, 64*C), (Bb, 27) -> (Bb, S, 216*C) slot-major halo."""
    return _b4_halo_sm_forward(x, nbr27)


def _b4_halo_sm_fwd(x, nbr27):
    return _b4_halo_sm_forward(x, nbr27), nbr27


def _b4_halo_sm_bwd(nbr27, dh):
    """Scatter-free fold, slot-major: per direction d, slice the halo
    window (contiguous slot-runs, channels minor), gather it over the -d
    neighbor map, zero-pad back to 16 yz columns (axis -2) and
    accumulate per source x-plane."""
    bb, s = dh.shape[0], dh.shape[1]
    c = dh.shape[2] // B4_HALO_VOL
    dh = jax.lax.optimization_barrier(dh)
    dhv = dh.reshape(bb, s, B4_HALO, B4_PLANE, c)
    # per-source-x-plane accumulators, each (Bb, S, 16, c)
    acc = [dhv[:, :, 1 + q, 0:16, :] for q in range(B4)]
    for d in _DIRS:
        if d == (0, 0, 0):
            continue
        dx, dy, dz = d
        mk = _DIRS.index((-dx, -dy, -dz))
        x0, x1 = _B4_X_DST[dx]
        c0, c1 = _B4_YZ_DST[(dy, dz)]
        px, wd = x1 - x0, c1 - c0
        window = dhv[:, :, x0:x1, c0:c1, :].reshape(bb, s * px * wd * c)
        piece = _gather_rows(window, nbr27[:, mk]).reshape(bb, s, px, wd, c)
        piece = _b4_yz_src_pad_sm(dy, dz, piece)  # (Bb, S, px, 16, c)
        s0, _ = _B4_X_SRC[dx]
        for q in range(px):
            acc[s0 + q] = acc[s0 + q] + piece[:, :, q, :, :]
    dx_out = jnp.stack(acc, axis=2).reshape(bb, s, B4_SLOTS * c)
    d_nbr = np.zeros(nbr27.shape, dtype=jax.dtypes.float0)
    return dx_out, d_nbr


b4_halo_sm.defvjp(_b4_halo_sm_fwd, _b4_halo_sm_bwd)


def b4_conv_weight_matrix_sm(w):
    """(..., 27, Cin, Cout) canonical kernel -> (..., 216*Cin, 64*Cout)
    dense conv matrix in SLOT-MAJOR channel-minor order: rows f*Cin+c
    (matching b4_halo_sm's columns), cols v*Cout+o (so the output is
    directly the next conv's slot-major input)."""
    cin, cout = w.shape[-2], w.shape[-1]
    lead = w.shape[:-3]
    w2 = b4_conv_weight_matrix(w).reshape(
        *lead, cin, B4_HALO_VOL, cout, B4_SLOTS
    )
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (1, 0, 3, 2)
    )
    return jnp.transpose(w2, perm).reshape(
        *lead, B4_HALO_VOL * cin, B4_SLOTS * cout
    )


# ------------------- direction-blocked slot-major halo (round 5, "sm3") --
#
# Decomposition measurements (docs/PROF_DECOMP_r05.json + prof_gather.py,
# 81920 bricks, S=9, bf16): the 26-fragment halo costs 63.6 ms per
# exchange and is BANDWIDTH/PASS-bound (~140 GB/s combined over ~3-4
# passes), not gather-row-rate bound — a plain 81920-row take runs at
# 145-190 GB/s combined regardless of row width down to ~1 KB.  The
# extra passes in the flat-group layout are (a) the per-plane re-grouping
# of gathered fragments (planes loop slicing axis 2 of each 4-D
# fragment) and (b) the 4-D (Bb, S, px, wd*c) fragment materializations
# (px <= 4 pads to 8 sublanes).  An axis-separated 3-pass halo (z as a
# shift, then y/x gathers of extended slabs) was built and REJECTED:
# multi-hop relays are wrong on sparse grids (a diagonal neighbor can
# exist while every intermediate face brick is absent — measured exactly
# the 56 edge/corner positions differing).
#
# The "sm3" layout instead keeps all 26 direct gathers (correct by
# construction) and makes each gather's output BE a halo column block:
#
#   h = concat([g_d for d in directions])     # ext-only, 152C columns
#   y = x @ Wc + h @ We                       # center never copied
#
# Every gather result reshapes (Bb, S, px*wd*c) 3-D and concatenates on
# the minor axis — no plane re-grouping pass, no 4-D intermediates, and
# the center block (64 of 216 columns, 30% of the halo bytes) rides the
# matmul directly from x.  The column order is a fixed static order
# absorbed by the conv weight matrix (b4_conv_weight_matrix_sm3 /
# _wc_we_split) and the dw tap selection (_SEL_SM3); halo values are
# copies, so any order is numerically exact.

_IDX_D = {d: _DIRS.index(d) for d in _DIRS}

# yz columns (of the 16 = y*4 + z per x-plane) that direction (dy, dz)
# ships, in _b4_yz_cols_sm slice order
_YZ_SHIP = {
    (0, 0): [(y, z) for y in range(4) for z in range(4)],
    (-1, 0): [(3, z) for z in range(4)],
    (1, 0): [(0, z) for z in range(4)],
    (0, -1): [(y, 3) for y in range(4)],
    (0, 1): [(y, 0) for y in range(4)],
    (-1, -1): [(3, 3)],
    (-1, 1): [(3, 0)],
    (1, -1): [(0, 3)],
    (1, 1): [(0, 0)],
}


def _b4_halo_sm3_forward(x, nbr27):
    """x (Bb, S, 64*C) slot-major -> (Bb, S, 152*C) direction-blocked
    EXT halo (no center block; pair with the Wc/We-split matmul)."""
    bb, s, vc = x.shape
    c = vc // B4_SLOTS
    xv = x.reshape(bb, s, B4, 16, c)

    pieces = []
    for d in _DIRS:
        if d == (0, 0, 0):
            continue
        dx, dy, dz = d
        sx = _B4_X_SRC[dx]
        pc = _b4_yz_cols_sm(xv[:, :, sx[0]: sx[1]], dy, dz)
        px, wd = pc.shape[2], pc.shape[3]
        flat = pc.reshape(bb, s * px * wd * c)
        g = _gather_rows(flat, nbr27[:, _IDX_D[d]])
        pieces.append(g.reshape(bb, s, px * wd * c))
    return jnp.concatenate(pieces, axis=2)  # (Bb, S, 152*C)


def _sm3_spatial_map() -> np.ndarray:
    """(216,) sm3 column -> spatial 6^3 halo position (x*36 + y*6 + z).

    Columns 0..63 are the center block (own slots, x*16+y*4+z); columns
    64..215 are the 26 direction blocks in _DIRS order, each block in
    (x-slice ascending) x (_YZ_SHIP order).  A slot (ux, uy, uz) shipped
    by neighbor d lands at halo coordinate h_axis = 0 if d_axis == -1,
    5 if d_axis == +1, u_axis + 1 otherwise."""
    cols = []
    for v in range(B4_SLOTS):  # center
        x, y, z = v >> 4, (v >> 2) & 3, v & 3
        cols.append((x + 1) * 36 + (y + 1) * 6 + (z + 1))

    def land(d_ax, u):
        return 0 if d_ax == -1 else (5 if d_ax == 1 else u + 1)

    for d in _DIRS:
        if d == (0, 0, 0):
            continue
        dx, dy, dz = d
        sx = _B4_X_SRC[dx]
        for ux in range(sx[0], sx[1]):
            for (uy, uz) in _YZ_SHIP[(dy, dz)]:
                cols.append(
                    land(dx, ux) * 36 + land(dy, uy) * 6 + land(dz, uz)
                )
    m = np.asarray(cols, np.int64)
    assert len(m) == 216 and len(np.unique(m)) == 216
    return m


_SM3_SPATIAL = _sm3_spatial_map()

# tap selection in sm3 column order: _SEL_STD is spatial (x*36+y*6+z)
# ordered; permuting its halo axis by the column map re-bases it.
# NUMPY on purpose (cached once): a jnp constant built lazily inside
# whatever jit first calls this LEAKS that trace's tracer into the
# global (same failure mode _slot_shift_tables documents; observed as
# UnexpectedTracerError on the second sm3 trace).
_SEL_SM3_NP = None


def _sel_sm3() -> np.ndarray:
    global _SEL_SM3_NP
    if _SEL_SM3_NP is None:
        _SEL_SM3_NP = np.ascontiguousarray(
            _sub_sel_tensor()[:, :, _SM3_SPATIAL]
        )
    return _SEL_SM3_NP


def b4_conv_weight_matrix_sm3(w):
    """(..., 27, Cin, Cout) canonical kernel -> (..., 216*Cin, 64*Cout)
    dense conv matrix in SM3 slot-major channel-minor order: rows
    f*Cin+c with f in sm3 column order ([center 64 | ext 152], matching
    x ++ _b4_halo_sm3_forward), cols v*Cout+o.  Consumers slice rows
    [:64*Cin] (Wc, applied to x directly) and [64*Cin:] (We, applied to
    the ext halo) — the center block never materializes in the halo."""
    cin, cout = w.shape[-2], w.shape[-1]
    lead = w.shape[:-3]
    w2 = jnp.einsum("ksh,...kco->...chos", _sel_sm3(), w).reshape(
        *lead, cin, B4_HALO_VOL, cout, B4_SLOTS
    )
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (1, 0, 3, 2)
    )
    return jnp.transpose(w2, perm).reshape(
        *lead, B4_HALO_VOL * cin, B4_SLOTS * cout
    )


def _halo_mode() -> str:
    """'flat' (default): the 26-fragment round-3 halo.  'sm3': the
    direction-blocked center-split halo — measured A/B on-chip (round 5):
    isolated conv value_and_grad wins 4.6% (107.7 vs 112.9 ms at level-0
    shapes) but the full trainer REGRESSES 2.8% (bench 1.262 vs
    1.228 s/frame/epoch), so flat stays the default and sm3 remains an
    equivalence-tested, selectable negative result (cf. the pallas conv
    kernels, docs/PROF_CONV_r04.json).  The codec records the mode in
    side_info numerics (both sides must build identical executables)."""
    return os.environ.get("LINR_HALO", "flat")


# ------------------------------- fused slot-major conv (one-gather VJP) --
#
# The halo exchange is gather ROW-rate bound (27 x Bb rows per pass,
# scripts/prof_step.py), so the backward must not pay extra passes.  The
# naive chain [h = halo(x); y = h @ W2] costs THREE passes per
# value_and_grad under rematerialization: the forward halo, the halo
# recompute for dW2 = h^T dy, and the scatter-free fold of dh.  This
# custom VJP reformulates the backward around ONE halo exchange *of dy*:
#
#   dx = halo(dy) @ Wt          (the transposed conv: flipped kernel,
#                                swapped channel roles — same einsum shape
#                                as the forward)
#   dw = SEL * (x^T halo(dy))   (x is already a saved activation; the
#                                (64C, 216O) moment contracts to the 27
#                                kernel taps through the static selection
#                                tensor)
#
# Two gather passes per value_and_grad instead of three, and no multi-GB
# halo residual: the only saved tensors are x and w.

_FLIP = [_DIRS.index((-dx, -dy, -dz)) for (dx, dy, dz) in _DIRS]


def _sm_prec(dt):
    return (
        jax.lax.Precision.HIGHEST
        if dt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _sm_acc(dt):
    # bf16 path accumulates in bf16 (output is cast anyway, and CPU's dot
    # kernel lacks BF16xBF16->F32); f32 stays f32
    return jnp.float32 if dt == jnp.float32 else dt


def _conv_kernel_mode() -> str:
    """'pallas' routes the three conv matmuls through the plane-blocked
    Mosaic kernels (ops/pallas_conv.py: 4x fewer FLOPs at C=8, windows
    sliced in VMEM); 'xla' (default) keeps the dense einsums."""
    return os.environ.get("LINR_CONV_KERNEL", "xla")


def _b4_convsm_forward(x, w, nbr27):
    dt = x.dtype
    c, o = w.shape[-2], w.shape[-1]
    if _conv_kernel_mode() == "pallas":
        # the plane-blocked kernels window the flat-group halo layout
        from .pallas_conv import plane_matmul

        h = jax.lax.optimization_barrier(_b4_halo_sm_forward(x, nbr27))
        w2 = b4_conv_weight_matrix_sm(w).astype(dt)
        return plane_matmul(h, w2, c, o)
    if _halo_mode() == "sm3":
        h = _b4_halo_sm3_forward(x, nbr27)
        if os.environ.get("LINR_HALO_BARRIER", "1") != "0":
            # the ext halo has exactly ONE consumer here (the We einsum),
            # so fusing gathers into the matmul operand read would be
            # safe; measured on-chip it made no difference (XLA
            # materializes the concat either way), so the barrier stays
            # as protection against consumer-side refusion elsewhere
            h = jax.lax.optimization_barrier(h)
        w2 = b4_conv_weight_matrix_sm3(w).astype(dt)  # (S, 216*C, 64*O)
        y = jnp.einsum(
            "bsk,skn->bsn", x, w2[:, : B4_SLOTS * c, :],
            precision=_sm_prec(dt), preferred_element_type=_sm_acc(dt),
        ) + jnp.einsum(
            "bsk,skn->bsn", h, w2[:, B4_SLOTS * c:, :],
            precision=_sm_prec(dt), preferred_element_type=_sm_acc(dt),
        )
        return y.astype(dt)
    h = jax.lax.optimization_barrier(_b4_halo_sm_forward(x, nbr27))
    w2 = b4_conv_weight_matrix_sm(w).astype(dt)
    return jnp.einsum(
        "bsk,skn->bsn", h, w2,
        precision=_sm_prec(dt), preferred_element_type=_sm_acc(dt),
    ).astype(dt)


@jax.custom_vjp
def b4_convsm(x, w, nbr27):
    """Fused slot-major 3^3 brick conv: x (Bb, S, 64*C) + canonical kernel
    w (S, 27, C, O) -> (Bb, S, 64*O).  Bias/mask live in the caller."""
    return _b4_convsm_forward(x, w, nbr27)


def _b4_convsm_fwd(x, w, nbr27):
    return _b4_convsm_forward(x, w, nbr27), (x, w, nbr27)


def _b4_convsm_bwd(res, dy):
    x, w, nbr27 = res
    dt = x.dtype
    bb, s, vc = x.shape
    c = vc // B4_SLOTS
    o = dy.shape[-1] // B4_SLOTS
    # dx: transposed conv — flipped taps, (C, O) roles swapped
    wt_src = jnp.swapaxes(w[..., _FLIP, :, :], -1, -2)  # (S, 27, O, C)
    if _conv_kernel_mode() == "pallas":
        from .pallas_conv import plane_matmul, plane_moment

        g = jax.lax.optimization_barrier(
            _b4_halo_sm_forward(dy.astype(dt), nbr27)
        )
        wt = b4_conv_weight_matrix_sm(wt_src).astype(dt)
        dx = plane_matmul(g, wt, o, c)
        dw = moment_taps(plane_moment(x, g, c, o), c, o)
    elif _halo_mode() == "sm3":
        dyt = dy.astype(dt)
        g = jax.lax.optimization_barrier(
            _b4_halo_sm3_forward(dyt, nbr27)
        )  # (Bb, S, 152*O) ext-only
        wt = b4_conv_weight_matrix_sm3(wt_src).astype(dt)  # (S, 216*O, 64*C)
        dx = (
            jnp.einsum(
                "bsj,sjm->bsm", dyt, wt[:, : B4_SLOTS * o, :],
                precision=_sm_prec(dt), preferred_element_type=_sm_acc(dt),
            )
            + jnp.einsum(
                "bsj,sjm->bsm", g, wt[:, B4_SLOTS * o:, :],
                precision=_sm_prec(dt), preferred_element_type=_sm_acc(dt),
            )
        ).astype(dt)
        # dw: center + ext moments, then the static tap selection in the
        # sm3 column order (tap k pairs x at voxel u with dy at halo
        # position SEL[flip(k), u, :])
        m_cen = jnp.einsum(
            "bsu,bsv->suv", x, dyt,
            precision=_sm_prec(dt), preferred_element_type=jnp.float32,
        ).reshape(s, B4_SLOTS, c, B4_SLOTS, o)
        m_ext = jnp.einsum(
            "bsu,bsj->suj", x, g,
            precision=_sm_prec(dt), preferred_element_type=jnp.float32,
        ).reshape(s, B4_SLOTS, c, B4_HALO_VOL - B4_SLOTS, o)
        sel = _sel_sm3()[np.asarray(_FLIP)]
        dw = jnp.einsum(
            "kuj,sucjo->skco", sel[:, :, :B4_SLOTS],
            m_cen.astype(jnp.float32),
        ) + jnp.einsum(
            "kuj,sucjo->skco", sel[:, :, B4_SLOTS:],
            m_ext.astype(jnp.float32),
        )
    else:
        g = jax.lax.optimization_barrier(
            _b4_halo_sm_forward(dy.astype(dt), nbr27)
        )  # (Bb, S, 216*O)
        wt = b4_conv_weight_matrix_sm(wt_src).astype(dt)  # (S, 216*O, 64*C)
        dx = jnp.einsum(
            "bsj,sjm->bsm", g, wt,
            precision=_sm_prec(dt), preferred_element_type=_sm_acc(dt),
        ).astype(dt)
        # dw: brick-contracted moment, then the static tap selection
        m = jnp.einsum(
            "bsu,bsj->suj", x, g,
            precision=_sm_prec(dt), preferred_element_type=jnp.float32,
        ).reshape(s, B4_SLOTS, c, B4_HALO_VOL, o)
        # tap k pairs x at voxel u with dy at u - off_k = halo position
        # SEL[flip(k), u, :]
        dw = jnp.einsum(
            "kuj,sucjo->skco",
            _SEL_B4[np.asarray(_FLIP)],
            m.astype(jnp.float32),
        )
    d_nbr = np.zeros(nbr27.shape, dtype=jax.dtypes.float0)
    return dx, dw.astype(w.dtype), d_nbr


b4_convsm.defvjp(_b4_convsm_fwd, _b4_convsm_bwd)


# -------------------------- conv + epilogue, fully fused (pallas mode) --
#
# y = (conv(x) + bias) * mask.  On the XLA path the bias/mask elementwise
# epilogue fuses into the conv einsum for free, but a pallas_call is a
# fusion boundary: without kernel-side fusion the epilogue costs one
# extra read+write of y per conv.  This wrapper carries the epilogue
# through the plane-blocked kernel and its VJP:
#
#   dy_masked = dy * mask            (fuses into the halo gather reads)
#   dx, dw    = conv backward of dy_masked (one halo exchange, as above)
#   db[s,o]   = sum over bricks and slots of dy_masked


def _b4_convsm_bm_forward(x, w, b, mask, nbr27):
    from .pallas_conv import plane_matmul

    dt = x.dtype
    c, o = w.shape[-2], w.shape[-1]
    h = jax.lax.optimization_barrier(_b4_halo_sm_forward(x, nbr27))
    w2 = b4_conv_weight_matrix_sm(w).astype(dt)
    bias = jnp.tile(b, (1, B4_SLOTS)).astype(dt)  # (S, 64*O)
    return plane_matmul(h, w2, c, o, bias=bias, mask=mask.astype(dt))


@jax.custom_vjp
def b4_convsm_bm(x, w, b, mask, nbr27):
    """Plane-blocked conv with the bias+mask epilogue fused in-kernel:
    x (Bb, S, 64*C), w (S, 27, C, O), b (S, O), mask (Bb, 64) ->
    (Bb, S, 64*O).  Pallas-mode twin of b4_convsm + caller epilogue."""
    return _b4_convsm_bm_forward(x, w, b, mask, nbr27)


def _b4_convsm_bm_fwd(x, w, b, mask, nbr27):
    return (
        _b4_convsm_bm_forward(x, w, b, mask, nbr27),
        (x, w, b, mask, nbr27),
    )


def _b4_convsm_bm_bwd(res, dy):
    from .pallas_conv import plane_matmul, plane_moment

    x, w, b, mask, nbr27 = res
    dt = x.dtype
    bb, s, vc = x.shape
    c = vc // B4_SLOTS
    o = dy.shape[-1] // B4_SLOTS
    dym = dy.astype(dt) * jnp.repeat(mask, o, axis=-1)[:, None, :].astype(dt)
    g = jax.lax.optimization_barrier(_b4_halo_sm_forward(dym, nbr27))
    wt_src = jnp.swapaxes(w[..., _FLIP, :, :], -1, -2)
    wt = b4_conv_weight_matrix_sm(wt_src).astype(dt)
    dx = plane_matmul(g, wt, o, c)
    dw = moment_taps(plane_moment(x, g, c, o), c, o)
    db = jnp.sum(
        dym.astype(jnp.float32).reshape(bb, s, B4_SLOTS, o), axis=(0, 2)
    )
    return (
        dx,
        dw.astype(w.dtype),
        db.astype(b.dtype),
        jnp.zeros_like(mask),  # geom constant, but float -> real zeros
        np.zeros(nbr27.shape, dtype=jax.dtypes.float0),
    )


b4_convsm_bm.defvjp(_b4_convsm_bm_fwd, _b4_convsm_bm_bwd)


# --------------------------------------------------- device brickify ----
#
# The codec's per-level geometry (brick structure, neighbor maps,
# 7-neighbor feature codes) used to be rebuilt host-side per codec side
# (build_superbrick_level) and uploaded: ~11 MB/frame of int32 code/nbr
# arrays at level 0 — the dominant cost of the round-2 codec through the
# dev tunnel, and ~1 s/frame of host numpy per side.  This is the same
# computation as sorts + sorted lookups, so it runs in-jit on device:
# both codec sides derive geometry from coordinates the decoder already
# has on device (base layer + octree_up chain), and only packed
# occupancy bits and per-voxel f16 probabilities cross the link.


@functools.lru_cache(maxsize=None)
def _slot_dir_tables(side: int, off: tuple):
    """Static tables for reading ANY 27-offset neighbor cell in the flat
    (Bb, slots) layout: for slot s and offset ``off``, ``tdir[s]`` is the
    _DIRS index of the componentwise brick carry (floor-div of the
    shifted coordinate — the neighbor CELL may cross into a different
    brick per component), and ``perm[s]`` the neighbor's slot (wrapped
    mod side).  Generalizes _slot_shift_tables (whose single ``crosses``
    bool is only valid for the 6 face offsets)."""
    shift = side.bit_length() - 1
    m = side - 1
    slots = side**3
    tdir = np.zeros((slots,), np.int32)
    perm = np.zeros((slots,), np.int32)
    dx, dy, dz = off
    for s in range(slots):
        x, y, z = s >> (2 * shift), (s >> shift) & m, s & m
        nx, ny, nz = x + dx, y + dy, z + dz
        carry = (nx // side, ny // side, nz // side)
        tdir[s] = _DIRS.index(carry)
        perm[s] = ((nx & m) << (2 * shift)) | ((ny & m) << shift) | (nz & m)
    return tdir, perm


_DIR_CENTER = _DIRS.index((0, 0, 0))


def dev_nbr27_from_parent(vb2, sl2, nbr27_pf2, idx_grid2, cap: int,
                          side: int = 4):
    """Level-s brick 27-neighbor map WITHOUT any key search: level-s
    bricks ARE level-(s+2) voxels (octree identity), so brick i's
    neighbor at offset d is the level-(s+2) voxel at coords2[i] + d —
    read from level-(s+2)'s OWN brickify geometry by pure gathers:

      vb2/sl2:    (Bv2,) level-(s+2) voxel -> ITS brick row / slot
      nbr27_pf2:  (cap2, 27) level-(s+2) per-frame brick neighbor map
      idx_grid2:  (cap2 * slots,) int32 grid of level-(s+2) voxel rows
                  (-1 empty) — the scatter inverse of (vb2, sl2)

    Replaces the 27 x cap sorted-key lookup (a (28*cap)-row bitonic sort
    per frame per level, the dominant term of the gp brickify: 698 of
    911 ms at level-0 chunk shapes, scripts/prof_dec_parts.py).
    Returns (cap, 27) int32, -1 absent."""
    slots = side**3
    bv2 = vb2.shape[0]
    cap2 = nbr27_pf2.shape[0]
    valid = vb2 >= 0
    vb2c = jnp.where(valid, vb2, 0)
    brow = jnp.take(nbr27_pf2, vb2c, axis=0)  # (Bv2, 27)
    cols = []
    for d in _DIRS:
        tdir_t, perm_t = _slot_dir_tables(side, d)
        td = jnp.asarray(tdir_t)[sl2]   # (Bv2,)
        pm = jnp.asarray(perm_t)[sl2]
        tb = jnp.where(
            td == _DIR_CENTER,
            vb2c,
            jnp.take_along_axis(brow, td[:, None], axis=1)[:, 0],
        )
        flat = jnp.where(tb >= 0, tb * slots + pm, cap2 * slots)
        val = jnp.take(idx_grid2, flat, mode="fill", fill_value=-1)
        cols.append(jnp.where(valid, val, -1))
    out = jnp.stack(cols, axis=1)  # (Bv2, 27)
    if bv2 >= cap:
        return out[:cap]
    return jnp.pad(out, ((0, cap - bv2), (0, 0)), constant_values=-1)


@functools.lru_cache(maxsize=None)
def _slot_shift_tables(side: int, off: tuple):
    """Static tables for reading a face-neighbor cell's occupancy in the
    flat (Bb, slots) layout (slot = x*s^2 + y*s + z): for output slot s,
    ``perm[s]`` is the neighbor cell's slot index (coordinates wrapped
    mod side — valid for BOTH the own-brick and the cross-brick case),
    and ``crosses[s]`` says whether the neighbor cell lies in the
    adjacent brick.  No spatial minor dims are ever materialized (the
    tile-padding law, docs/DESIGN.md)."""
    shift = side.bit_length() - 1
    m = side - 1
    slots = side**3
    perm = np.zeros((slots,), np.int32)
    crosses = np.zeros((slots,), bool)
    dx, dy, dz = off
    for s in range(slots):
        x, y, z = s >> (2 * shift), (s >> shift) & m, s & m
        nx, ny, nz = x + dx, y + dy, z + dz
        crosses[s] = not (0 <= nx < side and 0 <= ny < side and 0 <= nz < side)
        perm[s] = ((nx & m) << (2 * shift)) | ((ny & m) << shift) | (nz & m)
    # numpy on purpose: jnp constants created here would leak tracers out
    # of whatever jit first populated the cache
    return perm, crosses


def dev_brickify(coords, keys, scale_idx, brick_cap: int, side: int = 4):
    """Brickify one frame's level on device (jit-friendly, static shapes).

    Args:
      coords: (Nv, 3) int32, canonically sorted, pad-tailed.
      keys: (Nv,) int64 canonical keys (KEY_PAD on pads).
      scale_idx: traced or static int — the level's scale index.
      brick_cap: static brick capacity (must be >= n_bricks; both codec
        sides derive it from counts they share, so shapes agree).
      side: brick side (4 for the production slot-major layout).

    Returns dict:
      bkeys: (brick_cap,) int64 sorted unique brick keys, KEY_PAD-padded.
      n_bricks: scalar int32.
      vox_brick: (Nv,) int32 brick index per voxel (-1 on pads).
      vox_slot: (Nv,) int32 slot per voxel (0 on pads).
      code: (brick_cap, slots) int32 scale*128 + feat, -1 empty.
      nbr27: (brick_cap, 27) int32 brick neighbor map, -1 absent.

    Integer-exact equivalent of build_superbrick_level (same slot and
    key conventions); proven against it in tests/test_superbricks.py.

    Cost discipline (round-4 sync attribution: this function was the
    codec's single hottest non-conv phase, 0.66 s/frame at the finest
    level, all of it sort-based key search).  The brick key is NOT a
    monotone map of the canonical voxel key (lex order mixes sub-brick
    bits of a major component with brick bits of a minor one: voxel
    (0,5,0) < (1,0,0) but brick (0,1,0) > (0,0,0)), so ONE sort of the
    brick keys is unavoidable — but it carries the voxel index as
    payload, so the voxel->brick index is an inverse-permutation
    SCATTER of the running rank, not a searchsorted.  The 7-neighbor
    feature code is read from the brick occupancy grid via 6
    neighbor-brick ROW gathers + static column permutations
    (_slot_shift_tables) instead of a sorted 8 x Nv key search — that
    search was the dominant term.  The only remaining key search is
    the 27 x brick_cap neighbor map.
    """
    from .coords import KEY_PAD, coord_key

    shift = side.bit_length() - 1
    nv = coords.shape[0]
    valid = keys != KEY_PAD
    bkey_all = coord_key(coords >> shift, valid)  # (Nv,)
    sbk, order = jax.lax.sort(
        (bkey_all, jnp.arange(nv, dtype=jnp.int32)), num_keys=1
    )
    prev = jnp.concatenate([jnp.full((1,), -1, sbk.dtype), sbk[:-1]])
    is_first = (sbk != KEY_PAD) & (sbk != prev)
    n_bricks = jnp.sum(is_first.astype(jnp.int32))
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    dst = jnp.where(is_first, rank, brick_cap)
    bkeys = jnp.full((brick_cap,), KEY_PAD, jnp.int64).at[dst].set(
        sbk, mode="drop"
    )

    vox_brick = (
        jnp.zeros((nv,), jnp.int32)
        .at[order]
        .set(jnp.where(sbk != KEY_PAD, rank, -1).astype(jnp.int32))
    )
    return dev_brickify_geom(
        coords, keys, scale_idx, brick_cap, side, bkeys, n_bricks,
        vox_brick,
    )


def dev_brickify_geom(coords, keys, scale_idx, brick_cap: int, side: int,
                      bkeys, n_bricks, vox_brick, nbr27=None):
    """The grid/feature/neighbor half of :func:`dev_brickify`, given the
    brick identity (sorted unique ``bkeys`` + per-voxel ``vox_brick``).

    Split out so the codec can supply the identity WITHOUT the Nv-row
    key sort: by the octree identity, level-s 4^3 bricks ARE level-(s+2)
    voxels (coords >> 2 twice), whose device keys the codec chain
    already holds in canonical order, and a voxel's brick index is its
    GRANDPARENT index — the composition of the two per-child parent maps
    that ops.octree.octree_up_with_parent emits during the level
    transitions.  The sort was the codec's hottest geometry phase
    (round-4 sync attribution: 0.89 s/frame of device brickify).
    """
    from .coords import KEY_PAD, lookup
    from .octree import NEIGHBOR_OFFSETS_7

    shift = side.bit_length() - 1
    m = side - 1
    slots = side**3
    valid = keys != KEY_PAD
    slot = (
        ((coords[:, 0] & m) << (2 * shift))
        | ((coords[:, 1] & m) << shift)
        | (coords[:, 2] & m)
    ).astype(jnp.int32)
    slot = jnp.where(valid, slot, 0)

    if nbr27 is None:
        # neighbor keys by direct key arithmetic (same borrow argument
        # as the host build_superbrick_level: borders produce keys of
        # nonexistent bricks, so the exact-match lookup returns -1).
        # Callers with grandparent geometry pass a precomputed nbr27
        # (dev_nbr27_from_parent) — this sorted-key lookup is a
        # (28*cap)-row bitonic sort per frame.
        doff = jnp.asarray(
            [(dx << 42) + (dy << 21) + dz for (dx, dy, dz) in _DIRS],
            jnp.int64,
        )
        qk = jnp.where(
            (bkeys != KEY_PAD)[:, None],
            bkeys[:, None] + doff[None, :],
            KEY_PAD,
        )
        nbr27 = lookup(bkeys, qk)

    # brick-grid occupancy, then feat bits by shifted reads of it
    flat = jnp.where(valid, vox_brick * slots + slot, brick_cap * slots)
    occ_g = (
        jnp.zeros((brick_cap * slots,), jnp.int32)
        .at[flat]
        .set(1, mode="drop")
        .reshape(brick_cap, slots)
    )
    occ_pad = jnp.concatenate(
        [occ_g, jnp.zeros((1, slots), jnp.int32)], axis=0
    )
    feat_grid = occ_g  # bit 0 = self (always set on occupied slots)
    for k in range(1, 7):
        off = tuple(int(v) for v in NEIGHBOR_OFFSETS_7[k])
        nb = nbr27[:, _DIRS.index(off)]
        nbg = occ_pad[jnp.where(nb >= 0, nb, brick_cap)]  # (cap, slots)
        perm, crosses = _slot_shift_tables(side, off)
        src = jnp.where(
            jnp.asarray(crosses)[None, :],
            nbg[:, jnp.asarray(perm)],
            occ_g[:, jnp.asarray(perm)],
        )
        feat_grid = feat_grid + (src << k)
    code = jnp.where(
        occ_g > 0, jnp.int32(scale_idx) * 128 + feat_grid, jnp.int32(-1)
    )
    return dict(
        bkeys=bkeys,
        n_bricks=n_bricks,
        vox_brick=vox_brick,
        vox_slot=slot,
        code=code,
        nbr27=nbr27,
    )


def b4_halo_to_spatial(h: np.ndarray) -> np.ndarray:
    """Test/debug helper: (Bb, C, 216) flat group halo -> dense
    (Bb, C, 6, 6, 6) spatial halo (numpy)."""
    bb, c = h.shape[0], h.shape[1]
    out = np.zeros((bb, c, B4_HALO, B4_HALO, B4_HALO), h.dtype)
    for xp in range(B4_HALO):
        for y in range(B4_HALO):
            for z in range(B4_HALO):
                out[:, :, xp, y, z] = h[
                    :, :, xp * B4_PLANE + _b4_group_slot(y, z)
                ]
    return out


def _b4_sel_tensor():
    """SEL4 (27, 64, 216): output slot s (4^3, slot = x*16 + y*4 + z) with
    conv offset k reads flat halo column plane*36 + group(y', z')."""
    sel = np.zeros((27, B4_SLOTS, B4_HALO_VOL), np.float32)
    for k, (dx, dy, dz) in enumerate(_DIRS):
        for s in range(B4_SLOTS):
            x, y, z = s >> 4, (s >> 2) & 3, s & 3
            f = (x + dx + 1) * B4_PLANE + _b4_group_slot(y + dy + 1, z + dz + 1)
            sel[k, s, f] = 1.0
    return sel


_SEL_B4 = jnp.asarray(_b4_sel_tensor())  # (27, 64, 216)


@functools.lru_cache(maxsize=1)
def _sel_windows():
    """Windowed, pre-flipped tap selection (4, 27, 16, 108): plane p's
    slots u = p*16+r read only halo window [p*36, p*36+108), which is
    what pallas_conv.plane_moment stores.  SELW[p, k] =
    SEL[flip(k), p*16:(p+1)*16, p*36:(p+1+2)*36]."""
    sel = np.asarray(_b4_sel_tensor())[np.asarray(_FLIP)]
    selw = np.stack(
        [
            sel[:, p * 16: (p + 1) * 16, p * B4_PLANE: (p + 3) * B4_PLANE]
            for p in range(B4)
        ],
        axis=0,
    )
    return jnp.asarray(selw)


def moment_taps(mc, c: int, o: int):
    """Compact windowed moment (S, 4, 16*c, 108*o) f32 (from
    pallas_conv.plane_moment) -> dw (S, 27, c, o) via the static
    pre-flipped tap selection.  Twin of the dense-m einsum on the XLA
    path: tap k pairs x at voxel u with dy at u - off_k."""
    s = mc.shape[0]
    mc = mc.reshape(s, B4, 16, c, 3 * B4_PLANE, o)
    return jnp.einsum("pkuj,spucjo->skco", _sel_windows(), mc)


def b4_conv_weight_matrix(w):
    """(..., 27, Cin, Cout) canonical kernel -> (..., Cin*216, Cout*64)
    dense conv matrix in the FLAT GROUP halo order (matches b4_halo), so
    the halo feeds the MXU directly — no extraction step exists at 4^3."""
    cin, cout = w.shape[-2], w.shape[-1]
    w2 = jnp.einsum("ksh,...kco->...chos", _SEL_B4, w)
    return w2.reshape(*w.shape[:-3], cin * B4_HALO_VOL, cout * B4_SLOTS)


# ------------------------------------------------- sub-halo extraction + W --

# The eight 4^3 sub-bricks sit at offsets {0,4}^3 inside the 8^3 brick;
# each one's 6^3 halo is the static window [o, o+6) of the 10^3 halo.
SUB_OFFSETS = [(i, j, k) for i in (0, SUB) for j in (0, SUB) for k in (0, SUB)]


def sb_extract(h):
    """(Bb, C, 10, 100) group halo -> (8, Bb, C, 216): the eight sub-brick
    6^3 halos in the conv weight matrix's spatial order (x*36 + y*6 + z).
    x windows are plain slices; yz windows are selection matmuls."""
    bb, c = h.shape[0], h.shape[1]
    subs = [
        sb_yz_select(h[:, :, i: i + SUB_HALO, :], j, k).reshape(
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
