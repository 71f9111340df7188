"""Equivalence tests for the direction-blocked slot-major halo (sm3)
against the flat-group 26-fragment halo — same values, different column
order and assembly (ops/superbricks.py "direction-blocked slot-major
halo"; the center block rides the matmul from x and never enters the
halo tensor).

Also pins an invariant of canonical brick order (documented in the sm3
design notes; an axis-separated shift-based halo was rejected because
multi-hop relays break on sparse grids): the (0, 0, +1) neighbor, when
present, is row i+1 (its key is key(i)+1 and brick keys are sorted
unique).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from linr_pcgc_tpu.ops.superbricks import (
    B4_SLOTS,
    _DIRS,
    _SM3_SPATIAL,
    _b4_halo_sm_forward,
    _b4_halo_sm3_forward,
    b4_convsm,
    build_superbrick_level,
    b4_halo_to_spatial,
    _b4_group_slot,
    B4_PLANE,
)


def _real_level(seed=0, n=6000, depth=7):
    rng = np.random.default_rng(seed)
    pts = np.unique(
        rng.integers(0, 2**depth, (n, 3)).astype(np.int32), axis=0
    )
    key = (
        (pts[:, 0].astype(np.int64) << 42)
        | (pts[:, 1].astype(np.int64) << 21)
        | pts[:, 2]
    )
    pts = pts[np.argsort(key)]
    occ = rng.integers(0, 2, (len(pts), 8)).astype(np.uint8)
    feat = rng.integers(0, 128, len(pts)).astype(np.int32)
    return build_superbrick_level(pts, occ, feat, 0, side=4)


def test_z_neighbor_is_adjacent_row():
    """The invariant the z-shift rests on: nbr27[i, (0,0,+1)] is i+1 (or
    -1), nbr27[i, (0,0,-1)] is i-1 (or -1), in canonical brick order."""
    lev = _real_level(seed=1)
    izp = _DIRS.index((0, 0, 1))
    izm = _DIRS.index((0, 0, -1))
    n = lev.n_bricks
    idx = np.arange(n)
    zp = lev.nbr27[:, izp]
    zm = lev.nbr27[:, izm]
    assert np.all((zp == -1) | (zp == idx + 1))
    assert np.all((zm == -1) | (zm == idx - 1))


def _spatial_from_sm3(x, h3, c):
    """center x (Bb, S, 64*C) + ext halo (Bb, S, 152*C) sm3 -> dense
    (Bb, S, 6,6,6, C) spatial (numpy)."""
    bb, s, _ = h3.shape
    full = np.concatenate(
        [np.asarray(x).reshape(bb, s, 64, c), h3.reshape(bb, s, 152, c)],
        axis=2,
    )
    out = np.zeros((bb, s, 216, c), h3.dtype)
    out[:, :, _SM3_SPATIAL, :] = full
    return out.reshape(bb, s, 6, 6, 6, c)


def _spatial_from_flat(h, c):
    """(Bb, S, 216*C) flat-group slot-major halo -> dense spatial."""
    bb, s, _ = h.shape
    hv = h.reshape(bb, s, 6, 36, c)
    out = np.zeros((bb, s, 6, 6, 6, c), h.dtype)
    for y in range(6):
        for z in range(6):
            out[:, :, :, y, z, :] = hv[:, :, :, _b4_group_slot(y, z), :]
    return out


def test_halo_sm3_matches_flat_halo():
    lev = _real_level(seed=2)
    bb = lev.n_bricks
    c, s = 8, 3
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.normal(size=(bb, s, B4_SLOTS * c)), jnp.float32
    )
    nbr = jnp.asarray(lev.nbr27)
    h_flat = np.asarray(_b4_halo_sm_forward(x, nbr))
    h_sm3 = np.asarray(_b4_halo_sm3_forward(x, nbr))
    a = _spatial_from_sm3(x, h_sm3, c)
    b = _spatial_from_flat(h_flat, c)
    # the flat halo's center block carries pad-brick values that the
    # sm3 center (x itself) also carries — identical by construction;
    # compare everything
    np.testing.assert_array_equal(a, b)


def test_convsm_sm3_matches_flat_mode():
    """Forward + gradients of the fused conv are numerically equal in
    both halo modes (same math, different summation order -> allclose in
    f32)."""
    lev = _real_level(seed=3, n=3000)
    bb = lev.n_bricks
    c = o = 8
    s = 2
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(bb, s, B4_SLOTS * c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(s, 27, c, o)) * 0.3, jnp.float32)
    nbr = jnp.asarray(lev.nbr27)

    def loss(x_, w_):
        y = b4_convsm(x_, w_, nbr)
        return jnp.sum(y * y), y

    outs = {}
    for mode in ("flat", "sm3"):
        os.environ["LINR_HALO"] = mode
        try:
            (l, y), (gx, gw) = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True
            )(x, w)
            outs[mode] = (np.asarray(y), np.asarray(gx), np.asarray(gw))
        finally:
            os.environ.pop("LINR_HALO", None)
    y_f, gx_f, gw_f = outs["flat"]
    y_s, gx_s, gw_s = outs["sm3"]
    np.testing.assert_allclose(y_f, y_s, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(gx_f, gx_s, rtol=2e-5, atol=1e-3)
    # dw accumulates the brick moment in f32 with a different summation
    # structure (center/ext split): equality holds to f32 accumulation
    # noise relative to the (large, sum-over-bricks) values
    np.testing.assert_allclose(gw_f, gw_s, rtol=2e-3, atol=1e-6)


def test_sm3_spatial_map_is_bijective():
    assert sorted(_SM3_SPATIAL.tolist()) == list(range(216))
