"""Plane-blocked Pallas conv kernels (ops/pallas_conv.py) against the
dense slot-major einsums they replace.  On CPU these run the Pallas
interpreter — semantically exact, so tolerances are pure float-sum
reordering slack."""

import numpy as np
import jax
import jax.numpy as jnp

from linr_pcgc_tpu.ops.pallas_conv import (
    B4_SLOTS,
    B4_HALO_VOL,
    plane_matmul,
    plane_moment,
)
from linr_pcgc_tpu.ops.superbricks import (
    b4_conv_weight_matrix_sm,
    _DIRS,
)


def _rand(shape, seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), dtype)


def test_plane_matmul_equals_dense_einsum():
    """Multi-block + ragged tail: Bb = 1200 spans 3 TILE_B=512 blocks."""
    bb, s, c, o = 1200, 3, 5, 4
    h = _rand((bb, s, B4_HALO_VOL * c), 0)
    w = _rand((s, 27, c, o), 1) * 0.3
    w2 = b4_conv_weight_matrix_sm(w)
    ref = jnp.einsum(
        "bsk,skn->bsn", h, w2, precision=jax.lax.Precision.HIGHEST
    )
    got = plane_matmul(h, w2, c, o)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_plane_moment_matches_dense_in_window():
    """The accumulated compact plane moments (S, 4, 16c, 108o) equal the
    dense x^T g moment restricted to each plane's halo window (the only
    entries the tap selection ever reads)."""
    bb, s, c, o = 700, 2, 4, 3
    x = _rand((bb, s, B4_SLOTS * c), 2)
    g = _rand((bb, s, B4_HALO_VOL * o), 3)
    ref = np.asarray(
        jnp.einsum("bsu,bsj->suj", x, g, precision=jax.lax.Precision.HIGHEST)
    )
    got = np.asarray(plane_moment(x, g, c, o))
    assert got.shape == (s, 4, 16 * c, 108 * o)
    for p in range(4):
        u0, u1 = p * 16 * c, (p + 1) * 16 * c
        j0, j1 = p * 36 * o, (p + 3) * 36 * o
        np.testing.assert_allclose(
            got[:, p], ref[:, u0:u1, j0:j1], rtol=1e-4, atol=1e-4
        )


def test_b4_convsm_pallas_mode_matches_xla(monkeypatch):
    """Full custom-VJP conv (fwd + dx + dw) with LINR_CONV_KERNEL=pallas
    equals the XLA einsum path on a geometric sparse adjacency."""
    from linr_pcgc_tpu.ops import superbricks as sbops

    rng = np.random.default_rng(7)
    bb, s, c, o = 60, 2, 5, 4
    x = _rand((bb, s, B4_SLOTS * c), 8)
    w = _rand((s, 27, c, o), 9) * 0.3
    sites = rng.choice(6 * 6 * 6, size=bb, replace=False)
    coords = np.stack([sites // 36, (sites // 6) % 6, sites % 6], axis=1)
    lut = {tuple(cc): i for i, cc in enumerate(coords)}
    nbr = np.full((bb, 27), -1, np.int32)
    for b in range(bb):
        for d_i, d in enumerate(_DIRS):
            key = tuple(coords[b] + np.asarray(d))
            if key in lut:
                nbr[b, d_i] = lut[key]
    nbr = jnp.asarray(nbr)
    ct = _rand((bb, s, B4_SLOTS * o), 10)

    def run():
        def loss(xx, ww):
            return jnp.sum(sbops.b4_convsm(xx, ww, nbr) * ct)

        y = sbops.b4_convsm(x, w, nbr)
        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        return np.asarray(y), np.asarray(gx), np.asarray(gw)

    monkeypatch.delenv("LINR_CONV_KERNEL", raising=False)
    y_x, gx_x, gw_x = run()
    monkeypatch.setenv("LINR_CONV_KERNEL", "pallas")
    y_p, gx_p, gw_p = run()
    np.testing.assert_allclose(y_p, y_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gx_p, gx_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw_p, gw_x, rtol=1e-4, atol=1e-4)


def test_b4_convsm_bm_fused_epilogue_matches_unfused():
    """The bias+mask-fused kernel (b4_convsm_bm) equals conv -> +bias ->
    *mask composed from the plain conv, for the value and all grads
    (x, w, b); the mask cotangent is zeros (geometry constant)."""
    from linr_pcgc_tpu.ops import superbricks as sbops

    rng = np.random.default_rng(11)
    bb, s, c, o = 50, 2, 4, 3
    x = _rand((bb, s, B4_SLOTS * c), 12)
    w = _rand((s, 27, c, o), 13) * 0.3
    b = _rand((s, o), 14)
    mask = jnp.asarray(
        (rng.uniform(size=(bb, B4_SLOTS)) < 0.7).astype(np.float32)
    )
    sites = rng.choice(5 * 5 * 5, size=bb, replace=False)
    coords = np.stack([sites // 25, (sites // 5) % 5, sites % 5], axis=1)
    lut = {tuple(cc): i for i, cc in enumerate(coords)}
    nbr = np.full((bb, 27), -1, np.int32)
    for i in range(bb):
        for d_i, d in enumerate(_DIRS):
            key = tuple(coords[i] + np.asarray(d))
            if key in lut:
                nbr[i, d_i] = lut[key]
    nbr = jnp.asarray(nbr)
    ct = _rand((bb, s, B4_SLOTS * o), 15)

    def ref(xx, ww, bb_):
        y = sbops.b4_convsm(xx, ww, nbr)
        y = y + jnp.tile(bb_, (1, B4_SLOTS))[None]
        return y * jnp.repeat(mask, o, axis=-1)[:, None, :]

    def fused(xx, ww, bb_):
        return sbops.b4_convsm_bm(xx, ww, bb_, mask, nbr)

    np.testing.assert_allclose(
        np.asarray(fused(x, w, b)), np.asarray(ref(x, w, b)),
        rtol=1e-5, atol=1e-5,
    )
    g_r = jax.grad(
        lambda *a: jnp.sum(ref(*a) * ct), argnums=(0, 1, 2)
    )(x, w, b)
    g_f = jax.grad(
        lambda *a: jnp.sum(fused(*a) * ct), argnums=(0, 1, 2)
    )(x, w, b)
    for a, e in zip(g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-4
        )
