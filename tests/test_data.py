"""Tests for PLY IO, synthetic clouds, and the pyramid dataset/cache."""

import os

import numpy as np
import pytest

from linr_pcgc_tpu.data import (
    read_ply,
    write_ply_ascii,
    write_ply_binary,
    smooth_shell,
    synthetic_cloud,
    build_pyramid,
    PyramidDataset,
    bucket_size,
)


def test_smooth_shell_loot_regime():
    """The loot-regime generator: a deterministic, unique, in-bounds,
    THIN smooth shell (the rate-evidence input; docs/RATE_r03.json)."""
    a = smooth_shell(30_000, depth=8, seed=3, phase=0.0)
    assert a.dtype == np.int32
    assert a.min() >= 0 and a.max() < (1 << 8)
    # unique rows
    key = (a[:, 0].astype(np.int64) << 16) | (a[:, 1].astype(np.int64) << 8) | a[:, 2]
    assert len(np.unique(key)) == len(a)
    # lands near the target count (area calibration)
    assert 0.6 * 30_000 < len(a) < 1.6 * 30_000
    # smooth + thin: high mean children-per-parent (noisy clouds sit ~2.5)
    par = a // 2
    pk = (par[:, 0].astype(np.int64) << 16) | (par[:, 1].astype(np.int64) << 8) | par[:, 2]
    _, cnt = np.unique(pk, return_counts=True)
    assert cnt.mean() > 3.0
    # deterministic
    b = smooth_shell(30_000, depth=8, seed=3, phase=0.0)
    assert np.array_equal(a, b)
    # temporal coherence between adjacent phases
    c = smooth_shell(30_000, depth=8, seed=3, phase=0.06)
    ck = (c[:, 0].astype(np.int64) << 16) | (c[:, 1].astype(np.int64) << 8) | c[:, 2]
    assert np.isin(key, ck).mean() > 0.3
from linr_pcgc_tpu.data.dataset import save_pyramid, load_pyramid


def test_ply_ascii_roundtrip(tmp_path):
    pts = np.array([[0, 0, 0], [10, 20, 30], [1023, 5, 77]], np.int32)
    p = str(tmp_path / "a.ply")
    write_ply_ascii(p, pts)
    back = read_ply(p)
    np.testing.assert_array_equal(back, pts)
    header = open(p).read().split("end_header")[0]
    assert "property float x" in header and "format ascii 1.0" in header


def test_ply_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 1024, (500, 3)).astype(np.int32)
    p = str(tmp_path / "b.ply")
    write_ply_binary(p, pts)
    np.testing.assert_array_equal(read_ply(p), pts)


def test_ply_reads_extra_properties(tmp_path):
    p = str(tmp_path / "c.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
            "1 2 3 255 0 0\n4 5 6 0 255 0\n"
        )
    np.testing.assert_array_equal(read_ply(p), [[1, 2, 3], [4, 5, 6]])


def test_bucket_size_properties():
    for n in [1, 64, 1000, 1024, 1025, 5000, 300_000, 1_000_000]:
        b = bucket_size(n)
        assert b >= n
        assert b - n < max(1024, n // 4) + 1024  # bounded waste
    # monotonic
    vals = [bucket_size(n) for n in range(1, 20000, 37)]
    assert vals == sorted(vals)


def test_build_pyramid_structure():
    pts = synthetic_cloud(30_000, depth=8, seed=1)
    pyr = build_pyramid(pts)
    assert pyr.point_num == len(pts)
    # levels shrink and terminate below 64 points
    ns = [lev.n for lev in pyr.levels]
    assert all(a > b for a, b in zip(ns, ns[1:]))
    assert ns[-1] < 64 and ns[-2] >= 64
    # occupancy popcount at level 0 equals the original point count
    lev0 = pyr.levels[0]
    assert int(lev0.occ[: lev0.n].sum()) == len(pts)
    # every valid node has its self-bit set in the neighbor feature
    assert np.all(lev0.feat_code[: lev0.n] & 1 == 1)
    # base layer fits in uint8 (the low-xyz codec requirement,
    # test_utils.py:221)
    assert pyr.low_coords.max() < 256


def test_pyramid_cache_roundtrip(tmp_path):
    pts = synthetic_cloud(5_000, depth=7, seed=2)
    pyr = build_pyramid(pts)
    path = str(tmp_path / "f.npz")
    save_pyramid(path, pyr)
    back = load_pyramid(path)
    assert back.point_num == pyr.point_num
    assert back.scale_num == pyr.scale_num
    for a, b in zip(pyr.levels, back.levels):
        assert a.n == b.n
        np.testing.assert_array_equal(a.coords[: a.n], b.coords[: b.n])
        np.testing.assert_array_equal(a.occ[: a.n], b.occ[: b.n])
        np.testing.assert_array_equal(a.feat_code[: a.n], b.feat_code[: b.n])


def test_dataset_over_synthetic_and_cache(tmp_path):
    frames = [synthetic_cloud(3000, depth=7, seed=s) for s in range(3)]
    handle = str(tmp_path / "cache")
    ds = PyramidDataset(frames, handle_dir=handle)
    p0 = ds[0]
    assert ds.scale_num == p0.scale_num
    # cache file exists and a fresh dataset loads the same pyramid from it
    ds2 = PyramidDataset(frames, handle_dir=handle)
    q0 = ds2[0]
    assert q0.point_num == p0.point_num
    np.testing.assert_array_equal(
        q0.levels[0].coords[: q0.levels[0].n],
        p0.levels[0].coords[: p0.levels[0].n],
    )


def test_dataset_ply_dir(tmp_path):
    d = tmp_path / "plys"
    d.mkdir()
    frames = [synthetic_cloud(2000, depth=7, seed=s) for s in range(2)]
    for i, f in enumerate(frames):
        write_ply_ascii(str(d / f"frame{i:04d}.ply"), f)
    ds = PyramidDataset(str(d), handle_dir=None)
    assert len(ds) == 2
    np.testing.assert_array_equal(ds.raw_sorted_points(0), frames[0])
    pyr = ds[0]
    assert pyr.point_num == len(frames[0])


def test_corrupted_cache_regenerates(tmp_path):
    frames = [synthetic_cloud(2000, depth=7, seed=9)]
    handle = str(tmp_path / "cache")
    ds = PyramidDataset(frames, handle_dir=handle)
    ds[0]
    cache_file = os.path.join(handle, "frame0000.npz")
    assert os.path.exists(cache_file)
    with open(cache_file, "wb") as f:
        f.write(b"garbage")
    ds2 = PyramidDataset(frames, handle_dir=handle)
    pyr = ds2[0]  # must regenerate, not crash (cf. custom_dataset.py:238-244)
    assert pyr.point_num == len(frames[0])
