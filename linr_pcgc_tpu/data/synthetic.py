"""Synthetic dynamic point-cloud sequences for tests and benchmarks.

Generates voxelized surface-like clouds (noisy deformed spheres) with
frame-to-frame motion, matching the statistics that matter to the codec:
surface sparsity (~2-4 occupied octants per parent), multi-scale structure,
and temporal coherence within a GOP.  Used because the 8iVFB/Owlii/MVUB
datasets are not redistributable inside this repo; the CLI accepts real PLY
directories the same way the reference does.
"""

from __future__ import annotations

import numpy as np


def synthetic_cloud(
    n_points: int = 100_000,
    depth: int = 10,
    seed: int = 0,
    phase: float = 0.0,
) -> np.ndarray:
    """One frame: unique int32 voxel coordinates in [0, 2**depth)."""
    rng = np.random.default_rng(seed)
    side = float(1 << depth)
    v = rng.normal(size=(n_points, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
    # a lumpy, slowly rotating radius field makes the surface non-trivial
    theta = np.arctan2(v[:, 1], v[:, 0]) + phase
    phi = np.arccos(np.clip(v[:, 2], -1, 1))
    bumps = (
        0.12 * np.sin(3 * theta) * np.sin(2 * phi)
        + 0.08 * np.cos(5 * theta + phase)
        + 0.05 * np.sin(7 * phi)
    )
    radius = side * 0.42 * (1.0 + bumps)
    noise = rng.normal(scale=side * 0.002, size=(n_points, 1))
    pts = v * (radius[:, None] + noise) + side / 2
    pts = np.clip(np.round(pts), 0, side - 1).astype(np.int32)
    return np.unique(pts, axis=0)


def synthetic_sequence(
    n_frames: int,
    n_points: int = 100_000,
    depth: int = 10,
    seed: int = 0,
):
    """A temporally coherent sequence of frames (phase drifts per frame)."""
    return [
        synthetic_cloud(n_points, depth, seed=seed, phase=0.08 * t)
        for t in range(n_frames)
    ]
