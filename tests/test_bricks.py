"""Brick-layout backend tests: construction, halo exchange, and exact
equivalence of the brick network with the gather network."""

import numpy as np
import jax
import jax.numpy as jnp

from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
from linr_pcgc_tpu.models import ModelConfig, init_params, flatten_params
from linr_pcgc_tpu.models.network import forward_all_stages
from linr_pcgc_tpu.models.brick_network import (
    halo_exchange,
    _halo_forward,
    brick_forward_all_stages,
    brick_training_bits,
)
from linr_pcgc_tpu.ops import canonical_sort, coord_key, neighbor_map_27, neighbor_feature_code
from linr_pcgc_tpu.ops.bricks import build_brick_level, SLOTS
from linr_pcgc_tpu.runtime import TrainConfig, assemble_gop, adam_init, make_epoch_fn
from linr_pcgc_tpu.runtime.overfit import batch_arrays, frame_loss
from linr_pcgc_tpu.runtime.brick_overfit import (
    assemble_gop_bricks,
    brick_frame_loss,
    make_epoch_fn_bricks,
)


def test_build_brick_level_basic():
    rng = np.random.default_rng(0)
    pts = np.unique(rng.integers(0, 32, (500, 3), dtype=np.int32), axis=0)
    n = len(pts)
    occ = (rng.uniform(size=(n, 8)) < 0.4).astype(np.uint8)
    code = rng.integers(0, 128, n).astype(np.int32)
    lev = build_brick_level(pts, occ, code, scale_idx=2)
    # every voxel maps into its brick/slot and round-trips
    bc = lev.brick_coords[lev.voxel_brick]
    slot = lev.voxel_slot
    rec = bc * 4 + np.stack([slot >> 4, (slot >> 2) & 3, slot & 3], axis=1)
    np.testing.assert_array_equal(rec, pts)
    # masks and codes agree with voxel data
    assert lev.slot_mask.sum() == n
    assert np.all(
        lev.scale_code[lev.voxel_brick, slot] == 2 * 128 + code
    )
    np.testing.assert_array_equal(
        lev.occ[lev.voxel_brick, :, slot], occ
    )
    # neighbor map: center column is self
    np.testing.assert_array_equal(lev.nbr27[:, 13], np.arange(lev.n_bricks))


def test_halo_exchange_against_dense():
    """Halo content equals a brute-force dense neighborhood read."""
    rng = np.random.default_rng(1)
    pts = np.unique(rng.integers(0, 16, (200, 3), dtype=np.int32), axis=0)
    n = len(pts)
    occ = np.ones((n, 8), np.uint8)
    lev = build_brick_level(pts, occ, np.zeros(n, np.int32), 0)
    bb = lev.n_bricks
    c = 3
    x = rng.normal(size=(bb, c, SLOTS)).astype(np.float32)
    halo = np.asarray(halo_exchange(jnp.asarray(x), jnp.asarray(lev.nbr27)))
    assert halo.shape == (bb, c * 216)

    # dense reference: place bricks in a dict and read 6^3 neighborhoods
    from linr_pcgc_tpu.models.brick_network import _HALO_INDEX, _GROUPS

    def flat_pos(cc, h):
        # flat (group, c, slot) order of halo lane (c, h)
        start = 0
        for g in _GROUPS:
            if g["offset"] <= h < g["offset"] + g["size"]:
                return start + cc * g["size"] + (h - g["offset"])
            start += c * g["size"]
        raise AssertionError(h)

    bmap = {tuple(bcoord): i for i, bcoord in enumerate(lev.brick_coords)}
    for bi in range(min(bb, 10)):
        base = lev.brick_coords[bi].astype(int)
        for hx in range(6):
            for hy in range(6):
                for hz in range(6):
                    vx = base * 4 + np.array([hx - 1, hy - 1, hz - 1])
                    nb = tuple(vx >> 2)
                    h = _HALO_INDEX[hx, hy, hz]
                    if nb in bmap:
                        s = ((vx[0] & 3) << 4) | ((vx[1] & 3) << 2) | (vx[2] & 3)
                        expect = x[bmap[nb], :, s]
                    else:
                        expect = np.zeros(c, np.float32)
                    got = np.array([halo[bi, flat_pos(cc, h)] for cc in range(c)])
                    np.testing.assert_array_equal(got, expect)


def test_halo_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(2)
    pts = np.unique(rng.integers(0, 16, (150, 3), dtype=np.int32), axis=0)
    lev = build_brick_level(pts, np.ones((len(pts), 8), np.uint8), np.zeros(len(pts), np.int32), 0)
    bb = lev.n_bricks
    x = jnp.asarray(rng.normal(size=(bb, 4, SLOTS)).astype(np.float32))
    nbr = jnp.asarray(lev.nbr27)
    cot = jnp.asarray(rng.normal(size=(bb, 4 * 216)).astype(np.float32))
    g_custom = jax.grad(lambda x: jnp.sum(halo_exchange(x, nbr) * cot))(x)
    g_auto = jax.grad(lambda x: jnp.sum(_halo_forward(x, nbr) * cot))(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto), rtol=1e-5, atol=1e-6)


def _gop(n_frames=1, n_pts=2500, depth=7):
    frames = [synthetic_cloud(n_pts, depth=depth, seed=s) for s in range(n_frames)]
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    pyrs = [ds[i] for i in range(n_frames)]
    return ds, pyrs


def test_brick_forward_equals_gather_forward():
    """Logits at occupied voxels must match the gather network closely
    (different op order -> allclose, not bit-equal)."""
    ds, pyrs = _gop(1, 2200)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(0), cfg)

    vox = assemble_gop(pyrs)
    fd = {k: v[0] for k, v in batch_arrays(vox).items()}
    ref = np.asarray(
        forward_all_stages(
            params, cfg, fd["scale_id"], fd["feat_code"], fd["nbr27"],
            fd["occ"].astype(jnp.float32),
        )
    )  # (8, Nflat)

    bb = assemble_gop_bricks(pyrs)
    geom = dict(
        nbr27=bb.nbr27[0],
        mask=bb.mask[0].astype(jnp.float32)[:, None, :],
        code=bb.code[0],
    )
    blog = np.asarray(
        brick_forward_all_stages(
            params, cfg, geom, bb.occ[0].astype(jnp.float32), bb.level_slices
        )
    )  # (8, Bbflat, 64)

    # map voxels of each level between the two flat layouts
    from linr_pcgc_tpu.ops.bricks import build_brick_level

    for s, pyr_lev in enumerate(pyrs[0].levels):
        n = pyr_lev.n
        lev = build_brick_level(
            pyr_lev.coords[:n], pyr_lev.occ[:n], pyr_lev.feat_code[:n], s
        )
        voff = vox.level_offsets[s]
        boff = bb.level_slices[s][0]
        got = blog[:, boff + lev.voxel_brick, lev.voxel_slot]  # (8, n)
        want = ref[:, voff: voff + n]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_brick_loss_equals_gather_loss():
    ds, pyrs = _gop(2, 1500)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(1), cfg)
    vox = assemble_gop(pyrs)
    bb = assemble_gop_bricks(pyrs)
    for f in range(2):
        fd_v = {k: v[f] for k, v in batch_arrays(vox).items()}
        lv = float(frame_loss(params, cfg, fd_v))
        fd_b = dict(
            nbr27=bb.nbr27[f], mask=bb.mask[f], code=bb.code[f],
            occ=bb.occ[f], point_num=bb.point_num[f],
        )
        lb = float(brick_frame_loss(params, cfg, fd_b, bb.level_slices))
        assert abs(lv - lb) / lv < 1e-4, (lv, lb)


def test_brick_training_reduces_loss_and_tracks_gather_training():
    ds, pyrs = _gop(2, 1200)
    cfg = ModelConfig(scale_num=ds.scale_num)
    tc = TrainConfig()
    params0 = init_params(jax.random.PRNGKey(2), cfg)

    bb = assemble_gop_bricks(pyrs)
    # f32 compute for comparison against the (f32) gather trainer
    epoch_b = make_epoch_fn_bricks(cfg, tc, bb.level_slices, compute_dtype=jnp.float32)
    pb, ob = jax.tree_util.tree_map(jnp.copy, params0), adam_init(params0)
    lrb = jnp.asarray(tc.learning_rate, jnp.float32)
    kb = jnp.zeros((), jnp.int32)
    first = None
    for _ in range(4):
        pb, ob, lrb, kb, losses_b = epoch_b(pb, ob, lrb, kb, bb)
        if first is None:
            first = float(np.mean(np.asarray(losses_b)))
    last = float(np.mean(np.asarray(losses_b)))
    assert last < first * 0.9

    # trajectory tracks the gather trainer closely
    vox = assemble_gop(pyrs)
    epoch_v = make_epoch_fn(cfg, tc)
    pv, ov = params0, adam_init(params0)
    lrv = jnp.asarray(tc.learning_rate, jnp.float32)
    kv = jnp.zeros((), jnp.int32)
    for _ in range(4):
        pv, ov, lrv, kv, losses_v = epoch_v(pv, ov, lrv, kv, batch_arrays(vox))
    np.testing.assert_allclose(
        np.asarray(losses_b), np.asarray(losses_v), rtol=2e-3
    )
    # Adam normalizes tiny gradients, so f32 op-order noise amplifies on
    # low-gradient params; after 8 steps agreement to ~5e-3 absolute is
    # the expected envelope.
    np.testing.assert_allclose(
        np.asarray(flatten_params(pb)), np.asarray(flatten_params(pv)),
        rtol=5e-2, atol=5e-3,
    )


def test_brick_training_bf16_converges():
    """Mixed-precision (bf16 compute, f32 params/Adam) training works and
    tracks the f32 loss closely at this scale."""
    ds, pyrs = _gop(1, 1200)
    cfg = ModelConfig(scale_num=ds.scale_num)
    tc = TrainConfig()
    params = init_params(jax.random.PRNGKey(3), cfg)
    bb = assemble_gop_bricks(pyrs)
    epoch = make_epoch_fn_bricks(cfg, tc, bb.level_slices)  # default bf16
    p, o = params, adam_init(params)
    lr = jnp.asarray(tc.learning_rate, jnp.float32)
    k = jnp.zeros((), jnp.int32)
    first = None
    for _ in range(5):
        p, o, lr, k, losses = epoch(p, o, lr, k, bb)
        if first is None:
            first = float(np.mean(np.asarray(losses)))
    last = float(np.mean(np.asarray(losses)))
    assert np.isfinite(last) and last < first * 0.9, (first, last)
