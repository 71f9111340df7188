"""Tests for auxiliary subsystems: profiling, logging, bit heatmaps,
weight-codec method comparison."""

import logging
import os
import time

import numpy as np
import jax

from linr_pcgc_tpu.coding.weights import compare_methods
from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
from linr_pcgc_tpu.models import ModelConfig, init_params
from linr_pcgc_tpu.runtime.evaluate import frame_bit_heatmap
from linr_pcgc_tpu.utils import Timer, timed, set_logger


def test_timer_spans():
    t = Timer()
    with t.span("a"):
        time.sleep(0.01)
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] > 0.005
    assert "b" in s


def test_set_logger(tmp_path):
    path = str(tmp_path / "info.log")
    logger = set_logger(path, name="test_aux_logger")
    logger.info("hello world")
    for h in logger.handlers:
        h.flush()
    assert "hello world" in open(path).read()


def test_compare_methods():
    rng = np.random.default_rng(0)
    flat = rng.laplace(0, 0.05, 20000).astype(np.float32)
    out = compare_methods(flat, 8)
    assert out["bit_ori"] == 20000 * 32
    assert out["bit_laplace"] < out["bit_tobyte"]
    assert out["bit_zlib"] < out["bit_tobyte"]


def test_frame_bit_heatmap():
    frames = [synthetic_cloud(1500, depth=6, seed=0)]
    ds = PyramidDataset(frames, handle_dir=None)
    pyr = ds[0]
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(0), cfg)
    heat = frame_bit_heatmap(params, cfg, pyr)
    assert len(heat) == pyr.scale_num
    for lev, h in zip(pyr.levels, heat):
        assert h["coords"].shape == (lev.n, 3)
        assert h["bits"].shape == (lev.n, 8)
        assert np.all(h["bits"] >= 0)
        np.testing.assert_array_equal(h["gt"], lev.occ[: lev.n])
    # total heatmap bits approximate the frame's code length: finite, positive
    total = sum(h["bits"].sum() for h in heat)
    assert np.isfinite(total) and total > 0
