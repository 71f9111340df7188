"""Dense-brick sparse-voxel layout: the TPU-native data structure for the
hot convolutions.

Why: a submanifold k^3 convolution expressed as per-voxel gathers moves
32-byte rows through a hardware gather path that sustains only ~6 GB/s on
TPU (measured), two orders of magnitude under HBM bandwidth — it
dominated the training step.  Grouping voxels into 4x4x4 *bricks* turns
the same math into

    (1) six large-row gathers (>= 512 B rows) assembling a 6^3 halo per
        brick from face-neighbor bricks (three axis passes, corners
        propagate automatically like a distributed stencil exchange), and
    (2) one dense 3x3x3 convolution over the halo'd bricks on the MXU,
        masked back to occupied slots (zero activations at unoccupied
        slots keep dense convolution == submanifold convolution exactly).

The brick grid is the TPU analogue of TorchSparse/Minuet-style gather
re-organization (see PAPERS.md), adapted to the MXU instead of CUDA
shared memory.

Brick order is canonical (lexicographic by brick coordinate), slot index
is ((x&3)<<4) | ((y&3)<<2) | (z&3).  Construction is integer-exact pure
numpy (it runs once per frame/scale on the host geometry path).
"""

from __future__ import annotations

import dataclasses

import numpy as np

BRICK = 4
SLOTS = BRICK**3
# sentinel scale_code for unoccupied slots -> points at the zero LUT row
EMPTY_CODE_SENTINEL = -1


def _np_key(coords: np.ndarray) -> np.ndarray:
    c = coords.astype(np.int64)
    return (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2]


def _np_unkey(keys: np.ndarray) -> np.ndarray:
    m = (1 << 21) - 1
    return np.stack([(keys >> 42) & m, (keys >> 21) & m, keys & m], axis=1).astype(
        np.int32
    )


@dataclasses.dataclass
class BrickLevel:
    """One scale's brick grid (numpy, trimmed to n_bricks)."""

    brick_coords: np.ndarray  # (Bb, 3) int32, canonical order
    nbr27: np.ndarray         # (Bb, 27) int32 brick-neighbor map, -1 absent
    slot_mask: np.ndarray     # (Bb, 64) bool, occupied voxel slots
    scale_code: np.ndarray    # (Bb, 64) int32, scale*128+feat_code, -1 empty
    occ: np.ndarray           # (Bb, 8, 64) uint8 ground-truth child occupancy
    voxel_brick: np.ndarray   # (n_vox,) int32 brick index per voxel
    voxel_slot: np.ndarray    # (n_vox,) int32 slot per voxel
    n_vox: int

    @property
    def n_bricks(self) -> int:
        return self.brick_coords.shape[0]


def build_brick_level(
    coords: np.ndarray,
    occ: np.ndarray,
    feat_code: np.ndarray,
    scale_idx: int,
) -> BrickLevel:
    """Brickify one level.  Inputs are the *trimmed* per-level arrays in
    canonical voxel order: coords (n,3), occ (n,8), feat_code (n,)."""
    n = len(coords)
    c = coords.astype(np.int64)
    bkey = _np_key(coords >> 2)
    brick_keys, inv = np.unique(bkey, return_inverse=True)
    bb = len(brick_keys)
    slot = ((c[:, 0] & 3) << 4) | ((c[:, 1] & 3) << 2) | (c[:, 2] & 3)
    slot = slot.astype(np.int32)

    slot_mask = np.zeros((bb, SLOTS), bool)
    slot_mask[inv, slot] = True
    scale_code = np.full((bb, SLOTS), EMPTY_CODE_SENTINEL, np.int32)
    scale_code[inv, slot] = scale_idx * 128 + feat_code.astype(np.int32)
    occ_b = np.zeros((bb, 8, SLOTS), np.uint8)
    occ_b[inv, :, slot] = occ.astype(np.uint8)

    brick_coords = _np_unkey(brick_keys)
    # 27-neighbor map at brick granularity (lex offset order, like the
    # voxel-level map)
    r = np.array(
        [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        np.int64,
    )
    q = brick_coords[:, None, :].astype(np.int64) + r[None, :, :]
    valid = np.all(q >= 0, axis=2)
    qkey = (q[:, :, 0] << 42) | (q[:, :, 1] << 21) | q[:, :, 2]
    pos = np.searchsorted(brick_keys, qkey)
    pos_c = np.minimum(pos, bb - 1)
    hit = (brick_keys[pos_c] == qkey) & valid
    nbr = np.where(hit, pos_c, -1).astype(np.int32)

    return BrickLevel(
        brick_coords=brick_coords,
        nbr27=nbr,
        slot_mask=slot_mask,
        scale_code=scale_code,
        occ=occ_b,
        voxel_brick=inv.astype(np.int32),
        voxel_slot=slot,
        n_vox=n,
    )


# Face-neighbor direction indices in the lex 27-offset table:
#   (-1,0,0)=4, (+1,0,0)=22, (0,-1,0)=10, (0,+1,0)=16, (0,0,-1)=12, (0,0,+1)=14
FACE_NEG_X, FACE_POS_X = 4, 22
FACE_NEG_Y, FACE_POS_Y = 10, 16
FACE_NEG_Z, FACE_POS_Z = 12, 14
