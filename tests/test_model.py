"""Tests for the occupancy network: shapes, param inventory, conv math,
training/codec-path agreement, gradient flow."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from linr_pcgc_tpu.ops import coord_key, canonical_sort, neighbor_map_27, neighbor_feature_code, CONV_OFFSETS_27
from linr_pcgc_tpu.models import (
    ModelConfig,
    init_params,
    param_count,
    flatten_params,
    unflatten_params,
    forward_all_stages,
    training_bits,
    scale_input_lut,
    level_context,
    stage_logits,
)

CFG = ModelConfig()


def make_level(rng, n_pts, pad_extra=5, depth=4):
    pts = rng.integers(0, 1 << depth, size=(n_pts, 3), dtype=np.int32)
    pts = np.unique(pts, axis=0)
    total = len(pts) + pad_extra
    arr = np.zeros((total, 3), np.int32)
    arr[: len(pts)] = pts
    valid = np.zeros(total, bool)
    valid[: len(pts)] = True
    coords, keys = canonical_sort(jnp.asarray(arr), jnp.asarray(valid))
    nbr_t = neighbor_map_27(coords, keys).T  # feature-major (K, N)
    code = neighbor_feature_code(coords, keys)
    occ = (rng.uniform(size=(total, 8)) < 0.4).astype(np.float32)
    occ[len(pts):] = 0
    # every real parent has at least one child
    occ[: len(pts), 0] = np.maximum(occ[: len(pts), 0], 1)
    occ_t = jnp.asarray(occ.T)  # (8, N)
    return coords, keys, nbr_t, code, occ_t, jnp.asarray(valid), len(pts)


def test_param_count_matches_reference_architecture():
    # Analytic inventory of the reference model at default config
    # (SURVEY.md section 2.2): emb 56 + scale MLPs 2744 + block_in 5268 +
    # prune convs 13888 + inner MLPs 1928 + outer blocks 30828 = 54712.
    params = init_params(jax.random.PRNGKey(0), CFG)
    assert param_count(params) == 54712


def test_block_layers_param_counts():
    """--block_layers 2 must build the reference-equivalent network
    (ResNetBlock stacking, resnet.py:146-162): block_in gains one IRN
    (1796 params at ch=8, k=3).  block_type='resnet' swaps the IRN for two
    3^3 convs (resnet.py:63-94, 2 x 1736)."""
    p2 = init_params(jax.random.PRNGKey(0), ModelConfig(block_layers=2))
    assert param_count(p2) == 54712 + 1796
    p3 = init_params(jax.random.PRNGKey(0), ModelConfig(block_layers=3))
    assert param_count(p3) == 54712 + 2 * 1796
    pr = init_params(
        jax.random.PRNGKey(0), ModelConfig(block_type="resnet")
    )
    assert param_count(pr) == 54712 - 1796 + 2 * 1736


def test_dilated_param_count():
    """block_type='dilation' builds the reference DilatedResNet
    (resnet.py:97-143) in block_in: dilation_list [1,2] (ResNetBlock never
    passes dilation, so the class default 2 always applies), two banks of
    two 27-point convs (4 x 1736 at ch=8) plus two 1x1 mixers
    (2 x (16*8+8))."""
    pd = init_params(jax.random.PRNGKey(0), ModelConfig(block_type="dilation"))
    assert param_count(pd) == 54712 - 1796 + 4 * 1736 + 2 * 136


def test_outstage_param_counts():
    """Grouped stage configs (get_stage_lst, upsample.py:24-35) must build
    the reference-equivalent parameter inventory: outstage prune convs and
    inner MLPs, group-width l1 heads, outer context blocks with
    cum-channel conv_in widths (upsample.py:46-47,58-76)."""
    from linr_pcgc_tpu.models.network import STAGE_GROUPS

    def ref_count(outstage, ch=8, hidden=24, kvol=27):
        groups = STAGE_GROUPS[outstage]
        cum = np.cumsum([len(g) for g in groups])
        base = 56 + 2744 + 5268  # scale_emb + scale MLPs + block_in
        prune = outstage * (kvol * ch * ch + ch)
        inner = outstage * (ch * hidden + hidden) + sum(
            hidden * len(g) + len(g) for g in groups
        )
        outer = sum(
            (kvol * int(cum[i]) * ch + ch) + 1796 + (kvol * ch * ch + ch)
            for i in range(outstage - 1)
        )
        return base + prune + inner + outer

    assert ref_count(8) == 54712  # sanity: the default inventory
    for o in (4, 3, 2, 1):
        p = init_params(jax.random.PRNGKey(0), ModelConfig(outstage=o))
        assert param_count(p) == ref_count(o), o


def test_outstage_forward_and_grad():
    """outstage=3 (ragged groups 2/2/4) trains through the gather backend:
    octant-order logits, finite nonzero gradients on every head."""
    cfg = ModelConfig(outstage=3)
    rng = np.random.default_rng(7)
    coords, keys, nbr, code, occ, valid, n = make_level(rng, 150)
    params = init_params(jax.random.PRNGKey(2), cfg)
    scale_id = jnp.zeros(coords.shape[0], jnp.int32)
    logits = forward_all_stages(params, cfg, scale_id, code, nbr, occ)
    assert logits.shape == (8, coords.shape[0])
    bits, grads = jax.value_and_grad(
        lambda p: training_bits(p, cfg, scale_id, code, nbr, occ, valid)
    )(params)
    assert np.isfinite(float(bits))
    for lp in grads["inner_mlp"]["l1"]:
        for leaf in jax.tree_util.tree_leaves(lp):
            a = np.asarray(leaf)
            assert np.all(np.isfinite(a)) and np.any(a != 0)
    for blk in grads["outer"]:
        a = np.asarray(blk["conv_in"]["w"])
        assert np.all(np.isfinite(a)) and np.any(a != 0)


def test_unsupported_config_rejected():
    import pytest

    with pytest.raises(ValueError):
        ModelConfig(block_type="bogus")
    with pytest.raises(ValueError):
        ModelConfig(block_layers=0)
    with pytest.raises(ValueError):
        ModelConfig(outstage=5)
    with pytest.raises(NotImplementedError):
        ModelConfig(instage=2)


def test_flatten_roundtrip():
    params = init_params(jax.random.PRNGKey(1), CFG)
    flat = flatten_params(params)
    assert flat.shape == (54712,)
    back = unflatten_params(params, flat)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # deterministic order: flattening twice gives identical bytes
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(flatten_params(params)))


def test_conv3_matches_dense_reference():
    """The gather+matmul conv must equal a brute-force neighborhood sum."""
    from linr_pcgc_tpu.models.network import _conv3

    rng = np.random.default_rng(2)
    coords, keys, nbr_t, _, _, valid, n = make_level(rng, 60, pad_extra=4)
    cin, cout = 3, 5
    x = rng.normal(size=(coords.shape[0], cin)).astype(np.float32)
    x[~np.asarray(valid)] = 0
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)
    y_t = np.asarray(
        _conv3(jnp.asarray(x.T), nbr_t, {"w": jnp.asarray(w), "b": jnp.asarray(b)})
    )  # (cout, N)

    cnp = np.asarray(coords)
    index = {tuple(c): i for i, c in enumerate(map(tuple, cnp[:n]))}
    for i in range(n):
        acc = b.copy()
        for o, off in enumerate(CONV_OFFSETS_27):
            j = index.get(tuple(cnp[i] + off))
            if j is not None:
                acc = acc + x[j] @ w[o]
        np.testing.assert_allclose(y_t[:, i], acc, rtol=2e-5, atol=2e-5)


def test_dilated_core_matches_dense_reference():
    """_dilated_core (DilatedResNet, resnet.py:136-143) against a dense
    brute-force evaluation with offsets scaled per dilation; also checks
    the scatter-free conv VJP on the d=2 map (the offset antisymmetry the
    backward relies on holds for any uniformly scaled offset table)."""
    from linr_pcgc_tpu.models.network import (
        DILATION_LIST, _dilated_core, _dilated_init, _conv3_op, _conv3_apply,
    )
    from linr_pcgc_tpu.ops import neighbor_map

    rng = np.random.default_rng(5)
    coords, keys, _, _, _, valid, n = make_level(rng, 80, pad_extra=4)
    maps = [
        neighbor_map(coords, keys, 3, d).T for d in DILATION_LIST
    ]
    idx_full = jnp.concatenate(maps, axis=0)  # (2*27, N)
    ch = 4
    x = rng.normal(size=(coords.shape[0], ch)).astype(np.float32)
    x[~np.asarray(valid)] = 0
    p = _dilated_init(jax.random.PRNGKey(3), ch)
    y = np.asarray(_dilated_core(jnp.asarray(x.T), idx_full, p))  # (ch, N)

    # dense reference
    cnp = np.asarray(coords)
    index = {tuple(c): i for i, c in enumerate(map(tuple, cnp[:n]))}

    def dense_conv(xin, conv, d):
        out = np.zeros((len(cnp), conv["b"].shape[0]), np.float32)
        w = np.asarray(conv["w"])
        for i in range(n):
            acc = np.asarray(conv["b"]).copy()
            for o, off in enumerate(CONV_OFFSETS_27):
                j = index.get(tuple(cnp[i] + d * off))
                if j is not None:
                    acc = acc + xin[j] @ w[o]
            out[i] = acc
        return out

    h = np.concatenate(
        [dense_conv(x, c, d) for c, d in zip(p["dc0"], DILATION_LIST)], axis=1
    )
    h = np.maximum(h @ np.asarray(p["dl0"]["w"]) + np.asarray(p["dl0"]["b"]), 0)
    h[~np.asarray(valid)] = 0  # pad rows: all-absent maps gathered zeros
    g = np.concatenate(
        [dense_conv(h, c, d) for c, d in zip(p["dc1"], DILATION_LIST)], axis=1
    )
    ref = g @ np.asarray(p["dl1"]["w"]) + np.asarray(p["dl1"]["b"]) + x
    np.testing.assert_allclose(y.T[:n], ref[:n], rtol=2e-4, atol=2e-4)

    # custom-VJP gradient on the d=2 map == autodiff of the plain apply
    w2 = p["dc0"][1]["w"]
    f_custom = lambda xx, ww: jnp.sum(jnp.sin(_conv3_op(xx, ww, maps[1])))
    f_plain = lambda xx, ww: jnp.sum(jnp.sin(_conv3_apply(xx, ww, maps[1])))
    gx_c, gw_c = jax.grad(f_custom, argnums=(0, 1))(jnp.asarray(x.T), w2)
    gx_p, gw_p = jax.grad(f_plain, argnums=(0, 1))(jnp.asarray(x.T), w2)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p), rtol=1e-4, atol=1e-5)


def test_forward_shapes_and_loss():
    rng = np.random.default_rng(3)
    coords, keys, nbr, code, occ, valid, n = make_level(rng, 200)
    params = init_params(jax.random.PRNGKey(2), CFG)
    scale_id = jnp.zeros(coords.shape[0], jnp.int32)
    logits = forward_all_stages(params, CFG, scale_id, code, nbr, occ)
    assert logits.shape == (8, coords.shape[0])
    bits = training_bits(params, CFG, scale_id, code, nbr, occ, valid)
    assert np.isfinite(float(bits))
    # untrained model ~ 1 bit per symbol: 8 symbols per valid node
    per_sym = float(bits) / (8 * n)
    assert 0.3 < per_sym < 3.0, per_sym


def test_dilated_forward_and_grad():
    """The dilated config trains through the gather backend: stacked
    (2*27, N) maps thread the whole forward, and the loss gradient is
    finite and nonzero on every dilated-core leaf."""
    from linr_pcgc_tpu.ops import neighbor_map

    cfg = ModelConfig(block_type="dilation")
    rng = np.random.default_rng(6)
    coords, keys, _, code, occ, valid, n = make_level(rng, 200)
    nbr = jnp.concatenate(
        [neighbor_map(coords, keys, 3, d).T for d in cfg.dilations], axis=0
    )
    params = init_params(jax.random.PRNGKey(2), cfg)
    scale_id = jnp.zeros(coords.shape[0], jnp.int32)
    bits, grads = jax.value_and_grad(
        lambda p: training_bits(p, cfg, scale_id, code, nbr, occ, valid)
    )(params)
    assert np.isfinite(float(bits))
    core = grads["block_in"]["core"][0]
    for leaf in jax.tree_util.tree_leaves(core):
        a = np.asarray(leaf)
        assert np.all(np.isfinite(a)) and np.any(a != 0)


def test_loss_ignores_padding():
    rng = np.random.default_rng(4)
    coords, keys, nbr, code, occ, valid, n = make_level(rng, 150, pad_extra=9)
    params = init_params(jax.random.PRNGKey(3), CFG)
    scale_id = jnp.zeros(coords.shape[0], jnp.int32)
    bits1 = float(training_bits(params, CFG, scale_id, code, nbr, occ, valid))
    # corrupt pad rows' occupancy: loss must not change
    occ2 = occ.at[:, n:].set(1.0)
    bits2 = float(training_bits(params, CFG, scale_id, code, nbr, occ2, valid))
    assert bits1 == bits2


def test_codec_path_matches_training_forward():
    """level_context + stage_logits with ground-truth occupancy must agree
    with the flat training forward (they are different XLA programs, so
    allclose, not bit-equal; bit-equality is only required *between encoder
    and decoder*, which share the staged path)."""
    rng = np.random.default_rng(5)
    coords, keys, nbr, code, occ, valid, n = make_level(rng, 180)
    params = init_params(jax.random.PRNGKey(4), CFG)
    scale_id = jnp.full(coords.shape[0], 3, jnp.int32)
    ref = np.asarray(forward_all_stages(params, CFG, scale_id, code, nbr, occ))

    x_glob = level_context(params, CFG, jnp.int32(3), code, nbr)
    for stage in range(8):
        lg = stage_logits(params, CFG, stage, x_glob, occ[:stage], nbr)
        np.testing.assert_allclose(np.asarray(lg)[0, :n], ref[stage, :n], rtol=1e-4, atol=1e-5)


def test_stage_logits_deterministic():
    """Same executable + same inputs -> bit-identical logits (the enc/dec
    symmetry requirement)."""
    rng = np.random.default_rng(6)
    coords, keys, nbr, code, occ, valid, n = make_level(rng, 120)
    params = init_params(jax.random.PRNGKey(5), CFG)
    x_glob = level_context(params, CFG, jnp.int32(1), code, nbr)
    a = np.asarray(stage_logits(params, CFG, 4, x_glob, occ[:4], nbr))
    b = np.asarray(stage_logits(params, CFG, 4, x_glob, occ[:4], nbr))
    np.testing.assert_array_equal(a, b)


def test_lut_matches_direct_mlp():
    from linr_pcgc_tpu.models.network import _mlp2

    params = init_params(jax.random.PRNGKey(6), CFG)
    lut = scale_input_lut(params, CFG)
    assert lut.shape == (CFG.scale_num, 128, CFG.ch)
    # spot-check one (scale, code) against direct evaluation
    s, codeval = 2, 0b1010011
    bits = jnp.asarray([(codeval >> k) & 1 for k in range(7)], jnp.float32)
    x = jnp.concatenate([params["scale_emb"][s], bits])[:, None]  # (15, 1)
    l0 = jax.tree_util.tree_map(lambda a: a[s], params["scale_mlp"]["l0"])
    l1 = jax.tree_util.tree_map(lambda a: a[s], params["scale_mlp"]["l1"])
    direct = _mlp2(x, l0, l1)[:, 0]
    np.testing.assert_allclose(
        np.asarray(lut[s, codeval]), np.asarray(direct), rtol=1e-5, atol=1e-6
    )


def test_gradients_flow_everywhere():
    rng = np.random.default_rng(7)
    coords, keys, nbr, code, occ, valid, n = make_level(rng, 100)
    params = init_params(jax.random.PRNGKey(7), CFG)
    # use a mix of scales so every scale MLP sees gradient
    scale_id = jnp.asarray(rng.integers(0, CFG.scale_num, coords.shape[0]), jnp.int32)
    grads = jax.grad(
        lambda p: training_bits(p, CFG, scale_id, code, nbr, occ, valid)
    )(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    nonzero = [float(np.abs(np.asarray(g)).sum()) for g in flat]
    assert all(v > 0 for v in nonzero), "some parameter got zero gradient"


def test_kernel_size_5_variant():
    """model_core2 parity: kernel_size plumbs through every block
    (reference models/model_core2.py); forward and codec stay consistent."""
    from linr_pcgc_tpu.ops import neighbor_map
    from linr_pcgc_tpu.ops import coord_key as _ck
    import jax.numpy as _jnp

    rng = np.random.default_rng(11)
    cfg5 = ModelConfig(scale_num=3, kernel_size=5)
    params = init_params(jax.random.PRNGKey(8), cfg5)
    # conv kernels carry 125 offsets
    assert params["block_in"]["conv_in"]["w"].shape[0] == 125
    coords, keys, _, code, occ, valid, n = make_level(rng, 80)
    nbr125_t = neighbor_map(coords, keys, 5).T
    assert nbr125_t.shape[0] == 125
    scale_id = _jnp.zeros(coords.shape[0], _jnp.int32)
    logits = forward_all_stages(params, cfg5, scale_id, code, nbr125_t, occ)
    assert logits.shape == (8, coords.shape[0])
    assert np.all(np.isfinite(np.asarray(logits)))



def test_conv3_custom_vjp_matches_autodiff():
    """The scatter-free backward must equal autodiff of the plain
    gather+matmul forward, for both dx and dw."""
    from linr_pcgc_tpu.models.network import _conv3_op, _conv3_apply

    rng = np.random.default_rng(12)
    coords, keys, nbr_t, _, _, valid, n = make_level(rng, 70, pad_extra=6)
    cin, cout = 4, 6
    x = jnp.asarray(rng.normal(size=(cin, coords.shape[0])).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(cout, coords.shape[0])).astype(np.float32))

    def loss_custom(x, w):
        return jnp.sum(_conv3_op(x, w, nbr_t) * cot)

    def loss_plain(x, w):
        return jnp.sum(_conv3_apply(x, w, nbr_t) * cot)

    gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p), rtol=1e-4, atol=1e-5)
