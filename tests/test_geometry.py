"""Property tests for the geometry core (keys, octree down/up, neighbors).

These mirror the reference's runtime self-checks (octree invertibility assert
at custom_dataset.py:295, coordinate-order invariants) as a real test suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from linr_pcgc_tpu.ops import (
    KEY_PAD,
    coord_key,
    key_to_coord,
    canonical_sort,
    lookup,
    octree_down,
    octree_up,
    neighbor_feature_code,
    neighbor_map_27,
    NEIGHBOR_OFFSETS_7,
    CONV_OFFSETS_27,
)


def random_voxels(rng, n, depth=6):
    """Random unique voxel set, canonically sorted, as numpy."""
    side = 1 << depth
    pts = rng.integers(0, side, size=(n, 3), dtype=np.int32)
    pts = np.unique(pts, axis=0)  # np.unique sorts lexicographically
    return pts


def pad_rows(coords, total):
    n = coords.shape[0]
    out = np.zeros((total, 3), np.int32)
    out[:n] = coords
    valid = np.zeros((total,), bool)
    valid[:n] = True
    return out, valid


def test_key_matches_lexicographic_order():
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 2**12, size=(5000, 3), dtype=np.int32)
    keys = np.asarray(coord_key(jnp.asarray(pts)))
    order_by_key = np.argsort(keys, kind="stable")
    order_lex = np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))
    np.testing.assert_array_equal(pts[order_by_key], pts[order_lex])


def test_key_roundtrip_and_pad():
    pts = np.array([[0, 0, 0], [5, 3, 1], [2**21 - 1] * 3], np.int32)
    keys = coord_key(jnp.asarray(pts))
    np.testing.assert_array_equal(np.asarray(key_to_coord(keys)), pts)
    # Out-of-range / masked rows become KEY_PAD.
    bad = np.array([[-1, 0, 0], [0, 2**21, 0]], np.int32)
    assert np.all(np.asarray(coord_key(jnp.asarray(bad))) == int(KEY_PAD))
    masked = coord_key(jnp.asarray(pts), jnp.asarray([True, False, True]))
    assert int(masked[1]) == int(KEY_PAD)


def test_canonical_sort_with_pads():
    rng = np.random.default_rng(1)
    pts = random_voxels(rng, 300)
    shuffled = pts[rng.permutation(len(pts))]
    arr, valid = pad_rows(shuffled, len(pts) + 17)
    coords_s, keys_s = canonical_sort(jnp.asarray(arr), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(coords_s)[: len(pts)], pts)
    assert np.all(np.asarray(keys_s)[len(pts):] == int(KEY_PAD))


def test_lookup_hits_and_misses():
    rng = np.random.default_rng(2)
    pts = random_voxels(rng, 500)
    arr, valid = pad_rows(pts, len(pts) + 9)
    keys = coord_key(jnp.asarray(arr), jnp.asarray(valid))
    # every present coordinate is found at its own row
    idx = lookup(keys, keys)
    np.testing.assert_array_equal(
        np.asarray(idx)[: len(pts)], np.arange(len(pts))
    )
    assert np.all(np.asarray(idx)[len(pts):] == -1)  # pad queries -> -1
    # absent coordinates -> -1
    probe = pts.copy()
    probe[:, 0] += 1 << 15  # far outside the populated cube
    qkeys = coord_key(jnp.asarray(probe))
    assert np.all(np.asarray(lookup(keys, qkeys)) == -1)


def _reference_octree_down(pts):
    """Straightforward numpy model of the reference octree_level.forward."""
    parents = np.unique(pts >> 1, axis=0)
    pset = {tuple(p) for p in map(tuple, pts)}
    occ = np.zeros((len(parents), 8), np.int32)
    for i, p in enumerate(parents):
        for o in range(8):
            child = p * 2 + np.array([(o >> 2) & 1, (o >> 1) & 1, o & 1])
            occ[i, o] = int(tuple(child) in pset)
    return parents, occ


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_octree_down_matches_reference_model(seed):
    rng = np.random.default_rng(seed)
    pts = random_voxels(rng, 400, depth=5)
    arr, valid = pad_rows(pts, len(pts) + 13)
    keys = coord_key(jnp.asarray(arr), jnp.asarray(valid))
    out_size = len(pts) + 13
    pc, pk, occ, n = octree_down(jnp.asarray(arr), keys, out_size)
    ref_parents, ref_occ = _reference_octree_down(pts)
    n = int(n)
    assert n == len(ref_parents)
    np.testing.assert_array_equal(np.asarray(pc)[:n], ref_parents)
    np.testing.assert_array_equal(np.asarray(occ)[:n], ref_occ)
    assert np.all(np.asarray(pk)[n:] == int(KEY_PAD))
    assert np.all(np.asarray(occ)[n:] == 0)


@pytest.mark.parametrize("seed", [3, 4])
def test_down_then_up_is_identity(seed):
    rng = np.random.default_rng(seed)
    pts = random_voxels(rng, 700, depth=6)
    arr, valid = pad_rows(pts, len(pts) + 5)
    keys = coord_key(jnp.asarray(arr), jnp.asarray(valid))
    pc, pk, occ, n_p = octree_down(jnp.asarray(arr), keys, arr.shape[0])
    children, ckeys, n_c = octree_up(pc, pk, occ)
    assert int(n_c) == len(pts)
    np.testing.assert_array_equal(np.asarray(children)[: len(pts)], pts)
    # recovered children are canonically sorted with pad tail
    assert np.all(np.asarray(ckeys)[len(pts):] == int(KEY_PAD))


@pytest.mark.parametrize("seed", [0, 6])
def test_numpy_octree_matches_device(seed):
    """The host (numpy) geometry twins — used by preprocessing and the
    superbrick codec's decoder-side rebuild — are integer-exact matches of
    the device ops, including the parent-key re-sort (child lex order does
    not imply parent lex order)."""
    from linr_pcgc_tpu.ops.octree import (
        np_feat_code,
        np_octree_down,
        np_octree_up,
    )
    from linr_pcgc_tpu.ops import neighbor_feature_code

    rng = np.random.default_rng(seed)
    pts = random_voxels(rng, 900, depth=6)
    parents, occ = np_octree_down(pts)

    keys = coord_key(jnp.asarray(pts), jnp.ones(len(pts), bool))
    pc, pk, occ_d, n = octree_down(jnp.asarray(pts), keys, len(pts))
    n = int(n)
    assert n == len(parents)
    np.testing.assert_array_equal(np.asarray(pc)[:n], parents)
    np.testing.assert_array_equal(np.asarray(occ_d)[:n].astype(np.uint8), occ)
    np.testing.assert_array_equal(np_octree_up(parents, occ), pts)

    code_d = neighbor_feature_code(jnp.asarray(pts), keys)
    np.testing.assert_array_equal(np_feat_code(pts), np.asarray(code_d))


def test_neighbor_feature_code():
    rng = np.random.default_rng(5)
    pts = random_voxels(rng, 300, depth=4)
    arr, valid = pad_rows(pts, len(pts) + 3)
    keys = coord_key(jnp.asarray(arr), jnp.asarray(valid))
    code = np.asarray(neighbor_feature_code(jnp.asarray(arr), keys))
    pset = {tuple(p) for p in map(tuple, pts)}
    for i in range(len(pts)):
        expect = 0
        for k, off in enumerate(NEIGHBOR_OFFSETS_7):
            q = tuple(pts[i] + off)
            if all(c >= 0 for c in q) and q in pset:
                expect |= 1 << k
        assert code[i] == expect, i
    assert np.all(code[len(pts):] == 0)
    # self bit always set for valid rows
    assert np.all(code[: len(pts)] & 1 == 1)


def test_neighbor_map_27():
    rng = np.random.default_rng(6)
    pts = random_voxels(rng, 250, depth=4)
    arr, valid = pad_rows(pts, len(pts) + 4)
    keys = coord_key(jnp.asarray(arr), jnp.asarray(valid))
    nbr = np.asarray(neighbor_map_27(jnp.asarray(arr), keys))
    index = {tuple(p): i for i, p in enumerate(map(tuple, pts))}
    for i in range(len(pts)):
        for o, off in enumerate(CONV_OFFSETS_27):
            q = tuple(pts[i] + off)
            expect = index.get(q, -1) if all(c >= 0 for c in q) else -1
            assert nbr[i, o] == expect
    assert np.all(nbr[len(pts):] == -1)
    # center offset (index 13) is self
    np.testing.assert_array_equal(nbr[: len(pts), 13], np.arange(len(pts)))


def test_numpy_octree_empty_input():
    """Empty frames must flow through, not crash (ADVICE r2): down of zero
    coords is zero parents, up of zero occupancy is zero children."""
    from linr_pcgc_tpu.ops.octree import np_octree_down, np_octree_up

    parents, occ = np_octree_down(np.zeros((0, 3), np.int32))
    assert parents.shape == (0, 3) and occ.shape == (0, 8)
    children = np_octree_up(parents, occ)
    assert children.shape == (0, 3)
