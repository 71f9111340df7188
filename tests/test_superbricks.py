"""Superbrick (8^3) backend tests: construction, halo exchange against a
dense brute force, VJP correctness of the scatter-free fold, and exact
per-voxel equivalence of the stage-batched network with both the brick
backend and the flat gather network."""

import numpy as np
import jax
import jax.numpy as jnp

from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
from linr_pcgc_tpu.models import ModelConfig, init_params
from linr_pcgc_tpu.models.brick_network import brick_forward_all_stages
from linr_pcgc_tpu.models.sb_network import sb_forward_all_stages
from linr_pcgc_tpu.ops.superbricks import (
    SB_SLOTS,
    build_superbrick_level,
    sb_halo,
    sb_extract,
    sb_conv_weight_matrix,
)
from linr_pcgc_tpu.runtime.brick_overfit import assemble_gop_bricks
from linr_pcgc_tpu.runtime.sb_overfit import (
    assemble_gop_superbricks,
    sb_frame_loss,
    make_epoch_fn_sb,
)
from linr_pcgc_tpu.runtime import TrainConfig, adam_init
from linr_pcgc_tpu.runtime.brick_overfit import (
    brick_frame_loss,
    make_epoch_fn_bricks,
)


def _rand_level(seed, span=24, n=400):
    rng = np.random.default_rng(seed)
    pts = np.unique(rng.integers(0, span, (n, 3), dtype=np.int32), axis=0)
    m = len(pts)
    occ = (rng.uniform(size=(m, 8)) < 0.4).astype(np.uint8)
    code = rng.integers(0, 128, m).astype(np.int32)
    return pts, occ, code


def test_build_superbrick_level_roundtrip():
    pts, occ, code = _rand_level(0)
    lev = build_superbrick_level(pts, occ, code, scale_idx=3)
    bc = lev.brick_coords[lev.voxel_brick]
    s = lev.voxel_slot
    rec = bc * 8 + np.stack([s >> 6, (s >> 3) & 7, s & 7], axis=1)
    np.testing.assert_array_equal(rec, pts)
    assert (lev.scale_code >= 0).sum() == len(pts)
    assert np.all(lev.scale_code[lev.voxel_brick, s] == 3 * 128 + code)
    np.testing.assert_array_equal(lev.occ[lev.voxel_brick, :, s], occ)
    np.testing.assert_array_equal(lev.nbr27[:, 13], np.arange(lev.n_bricks))


def test_sb_halo_against_dense():
    """10^3 halo content equals a brute-force dense neighborhood read."""
    pts, occ, code = _rand_level(1, span=32, n=900)
    lev = build_superbrick_level(pts, occ, code, 0)
    bb = lev.n_bricks
    c = 3
    rng = np.random.default_rng(2)
    from linr_pcgc_tpu.ops.superbricks import halo_group_to_spatial

    x = rng.normal(size=(bb, c, SB_SLOTS)).astype(np.float32)
    halo = np.asarray(sb_halo(jnp.asarray(x), jnp.asarray(lev.nbr27)))
    assert halo.shape == (bb, c, 10, 100)  # group-ordered, layout-friendly
    halo = halo_group_to_spatial(halo)

    xv = x.reshape(bb, c, 8, 8, 8)
    bmap = {tuple(bc): i for i, bc in enumerate(lev.brick_coords)}
    for bi in range(min(bb, 12)):
        base = lev.brick_coords[bi].astype(int)
        for hx in range(10):
            for hy in range(10):
                for hz in range(10):
                    gx, gy, gz = base * 8 + np.array([hx, hy, hz]) - 1
                    nb = bmap.get((gx // 8, gy // 8, gz // 8))
                    want = (
                        0.0
                        if nb is None or min(gx, gy, gz) < 0
                        else xv[nb, :, gx % 8, gy % 8, gz % 8]
                    )
                    np.testing.assert_allclose(
                        halo[bi, :, hx, hy, hz], want, atol=0
                    )


def test_sb_halo_vjp_matches_autodiff_of_forward():
    """The scatter-free fold equals autodiff of the raw forward."""
    from linr_pcgc_tpu.ops.superbricks import _halo_forward

    pts, occ, code = _rand_level(3, span=32, n=700)
    lev = build_superbrick_level(pts, occ, code, 0)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(lev.n_bricks, 2, SB_SLOTS)), jnp.float32)
    nbr = jnp.asarray(lev.nbr27)
    ct = jnp.asarray(
        rng.normal(size=(lev.n_bricks, 2, 10, 100)), jnp.float32
    )
    g_custom = jax.vjp(lambda a: sb_halo(a, nbr), x)[1](ct)[0]
    g_auto = jax.vjp(lambda a: _halo_forward(a, nbr), x)[1](ct)[0]
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), atol=1e-5
    )


def test_b4_halo_and_weight_matrix_reproduce_conv():
    """4^3 fast path: flat group-ordered halo content equals a dense
    brute-force neighborhood read, its VJP matches autodiff, and
    halo @ b4_conv_weight_matrix == direct dense 3^3 convolution."""
    from linr_pcgc_tpu.ops.superbricks import (
        b4_halo,
        b4_halo_to_spatial,
        b4_conv_weight_matrix,
        _b4_halo_forward,
    )

    pts, occ, code = _rand_level(11, span=20, n=600)
    lev = build_superbrick_level(pts, occ, code, 0, side=4)
    bb = lev.n_bricks
    cin, cout = 3, 2
    rng = np.random.default_rng(12)
    x = rng.normal(size=(bb, cin, 64)).astype(np.float32)
    nbr = jnp.asarray(lev.nbr27)
    halo = np.asarray(b4_halo(jnp.asarray(x), nbr))
    assert halo.shape == (bb, cin, 216)
    hv = b4_halo_to_spatial(halo)

    # dense brute force of the halo content
    xv = x.reshape(bb, cin, 4, 4, 4)
    bmap = {tuple(bc): i for i, bc in enumerate(lev.brick_coords)}
    for bi in range(min(bb, 10)):
        base = lev.brick_coords[bi].astype(int)
        for hx in range(6):
            for hy in range(6):
                for hz in range(6):
                    g = base * 4 + np.array([hx, hy, hz]) - 1
                    nb = bmap.get((g[0] // 4, g[1] // 4, g[2] // 4))
                    want = (
                        0.0
                        if nb is None or g.min() < 0
                        else xv[nb, :, g[0] % 4, g[1] % 4, g[2] % 4]
                    )
                    np.testing.assert_allclose(
                        hv[bi, :, hx, hy, hz], want, atol=0
                    )

    # VJP == autodiff of the raw forward
    ct = jnp.asarray(rng.normal(size=(bb, cin, 216)), jnp.float32)
    g_custom = jax.vjp(lambda a: b4_halo(a, nbr), jnp.asarray(x))[1](ct)[0]
    g_auto = jax.vjp(lambda a: _b4_halo_forward(a, nbr), jnp.asarray(x))[1](ct)[0]
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), atol=1e-5
    )

    # halo @ weight matrix == brute-force dense convolution per voxel
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    w2 = b4_conv_weight_matrix(jnp.asarray(w))  # (cin*216, cout*64)
    y = np.asarray(
        jnp.einsum("bk,kn->bn", jnp.asarray(halo.reshape(bb, cin * 216)), w2)
    ).reshape(bb, cout, 64)
    dirs = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1)]
    for vi in range(0, lev.n_vox, max(1, lev.n_vox // 25)):
        b_, s = lev.voxel_brick[vi], lev.voxel_slot[vi]
        lx, ly, lz = s >> 4, (s >> 2) & 3, s & 3
        want = np.zeros(cout)
        for k, (dx, dy, dz) in enumerate(dirs):
            want += hv[b_, :, lx + dx + 1, ly + dy + 1, lz + dz + 1] @ w[k]
        np.testing.assert_allclose(y[b_, :, s], want, rtol=1e-4, atol=1e-4)


def test_sb_extract_and_weight_matrix_reproduce_conv():
    """extraction + W2 matmul == direct dense 3^3 convolution."""
    pts, occ, code = _rand_level(5, span=24, n=500)
    lev = build_superbrick_level(pts, occ, code, 0)
    rng = np.random.default_rng(6)
    cin, cout = 3, 2
    x = rng.normal(size=(lev.n_bricks, cin, SB_SLOTS)).astype(np.float32)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)

    halo = sb_halo(jnp.asarray(x), jnp.asarray(lev.nbr27))
    ext = sb_extract(halo).reshape(8, lev.n_bricks, cin * 216)
    w2 = sb_conv_weight_matrix(jnp.asarray(w))
    y = np.asarray(jnp.einsum("pbk,kn->pbn", ext, w2))  # (8, Bb, cout*64)

    # brute force at a few voxels
    from linr_pcgc_tpu.ops.superbricks import halo_group_to_spatial

    hv = halo_group_to_spatial(np.asarray(halo))
    dirs = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1)]
    for vi in range(0, lev.n_vox, max(1, lev.n_vox // 20)):
        b, s = lev.voxel_brick[vi], lev.voxel_slot[vi]
        lx, ly, lz = s >> 6, (s >> 3) & 7, s & 7
        want = np.zeros(cout)
        for k, (dx, dy, dz) in enumerate(dirs):
            want += hv[b, :, lx + dx + 1, ly + dy + 1, lz + dz + 1] @ w[k]
        p = ((lx >= 4) << 2) | ((ly >= 4) << 1) | (lz >= 4)
        s64 = ((lx % 4) << 4) | ((ly % 4) << 2) | (lz % 4)
        got = y[p, b].reshape(cout, 64)[:, s64]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _gop(n_frames=2, n_points=2300, depth=6):
    frames = [synthetic_cloud(n_points, depth=depth, seed=s) for s in range(n_frames)]
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    return [ds[i] for i in range(n_frames)], ds.scale_num


def test_sb_network_matches_brick_network():
    """Per-voxel logits of the stage-batched superbrick forward equal the
    4^3 brick backend's (f32, same canonical params)."""
    pyrs, s_num = _gop()
    cfg = ModelConfig(scale_num=s_num)
    params = init_params(jax.random.PRNGKey(0), cfg)

    bb = assemble_gop_bricks(pyrs)
    sb = assemble_gop_superbricks(pyrs)

    for f in range(len(pyrs)):
        geom_b = dict(
            nbr27=bb.nbr27[f],
            mask=bb.mask[f].astype(jnp.float32)[:, None, :],
            code=bb.code[f],
            dtype=jnp.float32,
        )
        logits_b = np.asarray(
            brick_forward_all_stages(
                params, cfg, geom_b, bb.occ[f].astype(jnp.float32),
                bb.level_slices,
            )
        )  # (8, Bb4, 64)
        mask_s = (sb.code[f] >= 0).astype(jnp.float32)[:, None, None, :]
        geom_s = dict(
            nbr27=sb.nbr27[f], mask=mask_s, code=sb.code[f], dtype=jnp.float32
        )
        logits_s = np.asarray(
            sb_forward_all_stages(
                params, cfg, geom_s, sb.occ_dense(f).astype(jnp.float32),
                sb.level_slices,
            )
        )  # (Bb8, 8, 512)

        # compare on voxels via each layout's (brick, slot) maps
        from linr_pcgc_tpu.ops.bricks import build_brick_level
        from linr_pcgc_tpu.ops.superbricks import build_superbrick_level

        p = pyrs[f]
        off4 = off8 = 0
        for s in range(s_num):
            lev = p.levels[s]
            l4 = build_brick_level(
                lev.coords[: lev.n], lev.occ[: lev.n], lev.feat_code[: lev.n], s
            )
            l8 = build_superbrick_level(
                lev.coords[: lev.n], lev.occ[: lev.n], lev.feat_code[: lev.n],
                s, side=4,
            )
            a4 = bb.level_slices[s][0]
            a8 = sb.level_slices[s][0]
            v4 = logits_b[:, a4 + l4.voxel_brick, l4.voxel_slot]  # (8, n)
            v8 = logits_s[a8 + l8.voxel_brick, :, l8.voxel_slot].T  # (8, n)
            np.testing.assert_allclose(v4, v8, rtol=2e-4, atol=2e-4)


def test_sb_training_matches_brick_training():
    """A few epochs of sb training reach the same losses as the brick
    trainer (f32 compute, identical Adam/StepLR semantics)."""
    pyrs, s_num = _gop()
    cfg = ModelConfig(scale_num=s_num)
    tc = TrainConfig()
    params = init_params(jax.random.PRNGKey(1), cfg)

    bb = assemble_gop_bricks(pyrs)
    sb = assemble_gop_superbricks(pyrs)

    pb = ps = params
    ob = adam_init(pb)
    os_ = adam_init(ps)
    fb = make_epoch_fn_bricks(cfg, tc, bb.level_slices, compute_dtype=jnp.float32)
    fs = make_epoch_fn_sb(cfg, tc, sb.level_slices, compute_dtype=jnp.float32)
    lrb = lrs = jnp.asarray(tc.learning_rate, jnp.float32)
    kb = ks = jnp.zeros((), jnp.int32)
    for _ in range(3):
        pb, ob, lrb, kb, lb = fb(pb, ob, lrb, kb, bb)
        ps, os_, lrs, ks, ls = fs(ps, os_, lrs, ks, sb)
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(ls), rtol=2e-4, atol=2e-4
        )


def test_sb_matches_brick_with_stacked_and_resnet_blocks():
    """block_layers=2 and block_type='resnet' produce identical logits on
    the 4^3 and 8^3 backends (the stacked-core dispatch is shared code on
    the flat backend; here the two brick layouts cross-check each other)."""
    pyrs, s_num = _gop(n_frames=1, n_points=1200, depth=5)
    for kwargs in ({"block_layers": 2}, {"block_type": "resnet"}):
        cfg = ModelConfig(scale_num=s_num, **kwargs)
        params = init_params(jax.random.PRNGKey(7), cfg)
        bb = assemble_gop_bricks(pyrs)
        sb = assemble_gop_superbricks(pyrs)
        geom_b = dict(
            nbr27=bb.nbr27[0],
            mask=bb.mask[0].astype(jnp.float32)[:, None, :],
            code=bb.code[0],
            dtype=jnp.float32,
        )
        logits_b = np.asarray(
            brick_forward_all_stages(
                params, cfg, geom_b, bb.occ[0].astype(jnp.float32),
                bb.level_slices,
            )
        )
        mask_s = (sb.code[0] >= 0).astype(jnp.float32)[:, None, None, :]
        geom_s = dict(
            nbr27=sb.nbr27[0], mask=mask_s, code=sb.code[0],
            dtype=jnp.float32,
        )
        logits_s = np.asarray(
            sb_forward_all_stages(
                params, cfg, geom_s, sb.occ_dense(0).astype(jnp.float32),
                sb.level_slices,
            )
        )
        from linr_pcgc_tpu.ops.bricks import build_brick_level
        from linr_pcgc_tpu.ops.superbricks import build_superbrick_level

        p = pyrs[0]
        for s in range(s_num):
            lev = p.levels[s]
            l4 = build_brick_level(
                lev.coords[: lev.n], lev.occ[: lev.n], lev.feat_code[: lev.n], s
            )
            l8 = build_superbrick_level(
                lev.coords[: lev.n], lev.occ[: lev.n], lev.feat_code[: lev.n],
                s, side=4,
            )
            a4 = bb.level_slices[s][0]
            a8 = sb.level_slices[s][0]
            v4 = logits_b[:, a4 + l4.voxel_brick, l4.voxel_slot]
            v8 = logits_s[a8 + l8.voxel_brick, :, l8.voxel_slot].T
            np.testing.assert_allclose(v4, v8, rtol=2e-4, atol=2e-4)


def test_sb_grouped_grad_accumulation_matches_single():
    """Level-grouped gradient accumulation (the production memory path)
    reproduces the single-pass training trajectory: the loss is a sum over
    levels, so group-wise grads sum to the full-frame grad."""
    pyrs, s_num = _gop()
    cfg = ModelConfig(scale_num=s_num)
    tc = TrainConfig()
    params = init_params(jax.random.PRNGKey(2), cfg)
    sb = assemble_gop_superbricks(pyrs)
    total = sb.level_slices[-1][1]

    from linr_pcgc_tpu.runtime.sb_overfit import level_groups

    forced = max(total // 2, 64)
    assert len(level_groups(sb.level_slices, forced)) >= 2

    f1 = make_epoch_fn_sb(
        cfg, tc, sb.level_slices, compute_dtype=jnp.float32,
        max_group_bricks=total, stage_chunk=8,
    )
    fg = make_epoch_fn_sb(
        cfg, tc, sb.level_slices, compute_dtype=jnp.float32,
        max_group_bricks=forced, stage_chunk=4,
    )
    p1 = pg = params
    o1, og = adam_init(p1), adam_init(pg)
    lr1 = lrg = jnp.asarray(tc.learning_rate, jnp.float32)
    k1 = kg = jnp.zeros((), jnp.int32)
    for _ in range(2):
        p1, o1, lr1, k1, l1 = f1(p1, o1, lr1, k1, sb)
        pg, og, lrg, kg, lg = fg(pg, og, lrg, kg, sb)
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(lg), rtol=1e-5, atol=1e-5
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(pg)
    ):
        # grad-accumulation changes f32 summation order; through two
        # Adam rsqrt steps that yields ~1e-4-level parameter jitter
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-4
        )


def test_sb_fused_chunk_matches_forward_all_stages():
    """The fused [block_in ++ context] chunk pass (the production trainer
    path) reproduces sb_forward_all_stages' logits exactly at f32: row 0
    computes x_glob on the same halo exchanges as the context rows, and
    the 7->ch zero-pad of the occupancy input is a no-op."""
    from linr_pcgc_tpu.models.sb_network import (
        sb_forward_all_stages,
        sb_fused_chunk_logits,
    )

    pyrs, s_num = _gop(n_frames=1, n_points=1500, depth=5)
    cfg = ModelConfig(scale_num=s_num)
    params = init_params(jax.random.PRNGKey(11), cfg)
    sb = assemble_gop_superbricks(pyrs)
    mask = (sb.code[0] >= 0).astype(jnp.float32)[:, None, None, :]
    geom = dict(
        nbr27=sb.nbr27[0], mask=mask, code=sb.code[0], dtype=jnp.float32
    )
    occ = sb.occ_dense(0).astype(jnp.float32)
    ref = np.asarray(
        sb_forward_all_stages(params, cfg, geom, occ, sb.level_slices)
    )
    for base, cs in ((0, 8), (0, 4), (4, 4), (2, 2)):
        got = np.asarray(
            sb_fused_chunk_logits(
                params, cfg, geom, occ, jnp.int32(base), cs, sb.level_slices
            )
        )
        np.testing.assert_allclose(
            got, ref[:, base: base + cs, :], rtol=2e-5, atol=2e-5,
            err_msg=f"base={base} cs={cs}",
        )


def test_b4_convsm_vjp_matches_autodiff():
    """The fused conv's one-gather backward (dx via the transposed conv
    of halo(dy), dw via the static tap-selection contraction of
    x^T halo(dy)) equals autodiff of the plain halo+matmul forward."""
    import jax

    from linr_pcgc_tpu.ops.superbricks import (
        b4_convsm,
        _b4_halo_sm_forward,
        b4_conv_weight_matrix_sm,
        B4_SLOTS,
    )

    rng = np.random.default_rng(3)
    bb, s, c, o = 40, 3, 5, 4
    x = jnp.asarray(rng.standard_normal((bb, s, B4_SLOTS * c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((s, 27, c, o)) * 0.3, jnp.float32)
    # geometric sparse adjacency (what production neighbor maps are):
    # bricks at random 3-D sites, nbr by coordinate lookup
    from linr_pcgc_tpu.ops.superbricks import _DIRS

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

    def ref(x, w):
        h = _b4_halo_sm_forward(x, nbr)
        return jnp.einsum(
            "bsk,skn->bsn", h, b4_conv_weight_matrix_sm(w),
            precision=jax.lax.Precision.HIGHEST,
        )

    def fused(x, w):
        return b4_convsm(x, w, nbr)

    np.testing.assert_allclose(
        np.asarray(ref(x, w)), np.asarray(fused(x, w)), rtol=1e-5, atol=1e-5
    )
    ct = jnp.asarray(rng.standard_normal(ref(x, w).shape), jnp.float32)

    def loss(f):
        return lambda xx, ww: jnp.sum(f(xx, ww) * ct)

    gx_r, gw_r = jax.grad(loss(ref), argnums=(0, 1))(x, w)
    gx_f, gw_f = jax.grad(loss(fused), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_f), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_r), np.asarray(gw_f), rtol=1e-4, atol=1e-4)


def test_dev_brickify_matches_host_builder():
    """The jitted device brickify (codec geometry path) reproduces
    build_superbrick_level integer-exactly: brick order, codes, neighbor
    maps, voxel->(brick, slot) maps, and clean pad regions."""
    import jax

    from linr_pcgc_tpu.ops.superbricks import (
        dev_brickify,
        build_superbrick_level,
    )
    from linr_pcgc_tpu.ops.octree import np_feat_code, np_octree_down
    from linr_pcgc_tpu.ops.coords import coord_key
    from linr_pcgc_tpu.data import synthetic_cloud

    pts = synthetic_cloud(20000, depth=8, seed=1)
    c = np.unique(pts, axis=0)
    key = (
        (c[:, 0].astype(np.int64) << 42)
        | (c[:, 1].astype(np.int64) << 21)
        | c[:, 2].astype(np.int64)
    )
    c = c[np.argsort(key)]
    parents, occ = np_octree_down(c)
    lev = build_superbrick_level(
        parents, occ, np_feat_code(parents), 3, side=4
    )
    n = len(parents)
    nv = n + 37  # pad tail
    coords = np.zeros((nv, 3), np.int32)
    coords[:n] = parents
    kk = coord_key(jnp.asarray(coords), jnp.arange(nv) < n)
    cap = lev.n_bricks + 13
    out = jax.jit(
        dev_brickify, static_argnames=("brick_cap", "side")
    )(jnp.asarray(coords), kk, 3, cap, 4)
    assert int(out["n_bricks"]) == lev.n_bricks
    np.testing.assert_array_equal(
        np.asarray(out["code"])[: lev.n_bricks], lev.scale_code
    )
    np.testing.assert_array_equal(
        np.asarray(out["nbr27"])[: lev.n_bricks], lev.nbr27
    )
    np.testing.assert_array_equal(
        np.asarray(out["vox_brick"])[:n], lev.voxel_brick
    )
    np.testing.assert_array_equal(
        np.asarray(out["vox_slot"])[:n], lev.voxel_slot
    )
    assert np.all(np.asarray(out["code"])[lev.n_bricks:] == -1)
    assert np.all(np.asarray(out["nbr27"])[lev.n_bricks:] == -1)


def test_dev_nbr27_from_parent_matches_lookup():
    """The search-free brick neighbor map (grandparent-grid gathers,
    round 5) equals the sorted-key lookup, on real two-level geometry."""
    import numpy as np
    import jax.numpy as jnp
    from linr_pcgc_tpu.ops.coords import KEY_PAD, coord_key
    from linr_pcgc_tpu.ops.octree import np_octree_down
    from linr_pcgc_tpu.ops.superbricks import (
        dev_brickify,
        dev_nbr27_from_parent,
    )

    rng = np.random.default_rng(5)
    pts = np.unique(
        rng.integers(0, 2**7, (20000, 3)).astype(np.int32), axis=0
    )
    key = (
        (pts[:, 0].astype(np.int64) << 42)
        | (pts[:, 1].astype(np.int64) << 21)
        | pts[:, 2]
    )
    pts = pts[np.argsort(key)]
    # level s voxels = pts; level s+2 voxels = two octree downs
    p1, _ = np_octree_down(pts)
    p2, _ = np_octree_down(p1)

    def brickify(coords, cap):
        n = len(coords)
        pad = np.zeros((n + 7, 3), np.int32)
        pad[:n] = coords
        valid = np.zeros(len(pad), bool)
        valid[:n] = True
        keys = coord_key(jnp.asarray(pad), jnp.asarray(valid))
        return dev_brickify(jnp.asarray(pad), keys, 0, cap, 4), n

    cap_s = len(p2) + 9  # bricks of level s = voxels of level s+2
    geo_s, n_s = brickify(pts, cap_s)
    cap2 = max(64, len(p2) // 8 + 16)
    geo_2, n_2 = brickify(p2, cap2)

    # idx grid of level s+2 (the scatter inverse of its vox_brick/slot)
    vb2 = np.asarray(geo_2["vox_brick"])
    sl2 = np.asarray(geo_2["vox_slot"])
    grid = np.full(cap2 * 64, -1, np.int32)
    ok = vb2 >= 0
    grid[vb2[ok] * 64 + sl2[ok]] = np.flatnonzero(ok)

    got = np.asarray(
        dev_nbr27_from_parent(
            jnp.asarray(vb2), jnp.asarray(sl2),
            jnp.asarray(np.asarray(geo_2["nbr27"])),
            jnp.asarray(grid), cap_s, 4,
        )
    )
    want = np.asarray(geo_s["nbr27"])
    np.testing.assert_array_equal(got[: len(p2)], want[: len(p2)])
    assert np.all(got[len(p2):] == -1)
