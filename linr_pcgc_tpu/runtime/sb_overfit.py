"""GOP assembly and training on the superbrick layout (the TPU fast path,
v2 — see models/sb_network.py for the design).

Mirrors runtime/brick_overfit.py's assemble/epoch contract.  Identical
optimization semantics: the loss over occupied slots equals the flat
voxel loss, so Adam/StepLR trajectories match the parity trainer
(/root/reference/main.py:231-321 semantics, verified in tests).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..data.dataset import FramePyramid
from ..models import ModelConfig
from ..models.sb_network import sb_training_bits, ACT
from ..ops.superbricks import build_superbrick_level, SB_SLOTS
from .overfit import TrainConfig, adam_frame_update

F32 = jnp.float32


def _sb_bucket(n: int) -> int:
    # superbrick counts are ~100x smaller than voxel counts; fine buckets
    if n <= 64:
        return 64
    p = 1 << (int(n - 1).bit_length() - 1)
    step = max(64, p // 4)
    return ((n + step - 1) // step) * step


@dataclasses.dataclass
class SbGopBatch:
    nbr27: jax.Array     # (F, Bb, 27) int32 flat-global brick map, -1 absent
    code: jax.Array      # (F, Bb, 512) int32 scale*128+feat, -1 empty
    occ: jax.Array       # (F, Bb, 8, 512) uint8
    point_num: jax.Array  # (F,) float32
    level_slices: tuple  # static ((start, end), ...) per scale

    @property
    def n_frames(self):
        return self.nbr27.shape[0]


def assemble_gop_superbricks(pyramids: list[FramePyramid]) -> SbGopBatch:
    s_num = pyramids[0].scale_num
    assert all(p.scale_num == s_num for p in pyramids)

    bl = [
        [
            build_superbrick_level(
                p.levels[s].coords[: p.levels[s].n],
                p.levels[s].occ[: p.levels[s].n],
                p.levels[s].feat_code[: p.levels[s].n],
                s,
            )
            for s in range(s_num)
        ]
        for p in pyramids
    ]
    buckets = [
        _sb_bucket(max(bl[f][s].n_bricks for f in range(len(pyramids))))
        for s in range(s_num)
    ]
    offsets = np.cumsum([0] + buckets[:-1]).astype(np.int64)
    total = int(sum(buckets))
    level_slices = tuple(
        (int(offsets[s]), int(offsets[s] + buckets[s])) for s in range(s_num)
    )

    f_nbr, f_code, f_occ = [], [], []
    for f in range(len(pyramids)):
        nbr = np.full((total, 27), -1, np.int32)
        code = np.full((total, SB_SLOTS), -1, np.int32)
        occ = np.zeros((total, 8, SB_SLOTS), np.uint8)
        for s in range(s_num):
            lev = bl[f][s]
            a = int(offsets[s])
            nb = lev.n_bricks
            nbr[a: a + nb] = np.where(lev.nbr27 >= 0, lev.nbr27 + np.int32(a), -1)
            code[a: a + nb] = lev.scale_code
            occ[a: a + nb] = lev.occ
        f_nbr.append(nbr)
        f_code.append(code)
        f_occ.append(occ)

    return SbGopBatch(
        nbr27=jnp.asarray(np.stack(f_nbr)),
        code=jnp.asarray(np.stack(f_code)),
        occ=jnp.asarray(np.stack(f_occ)),
        point_num=jnp.asarray(
            np.array([p.point_num for p in pyramids], np.float32)
        ),
        level_slices=level_slices,
    )


def sb_frame_loss(params, cfg: ModelConfig, fd: dict, level_slices,
                  compute_dtype=jnp.float32):
    """Per-frame bits/point.  The slot mask is derived from the code
    sentinel (-1 = empty slot) — no separate mask array in HBM."""
    mask = (fd["code"] >= 0).astype(compute_dtype)[:, None, None, :]
    geom = dict(
        nbr27=fd["nbr27"], mask=mask, code=fd["code"], dtype=compute_dtype
    )
    bits = sb_training_bits(params, cfg, geom, fd["occ"], level_slices)
    return bits / fd["point_num"]


def make_epoch_fn_sb(cfg: ModelConfig, tc: TrainConfig, level_slices,
                     compute_dtype=jnp.bfloat16):
    """Same contract as brick_overfit.make_epoch_fn_bricks.

    The loss is wrapped in jax.checkpoint(policy=save_only_these_names
    ('act')): conv outputs are saved for the backward pass, the multi-GB
    halo/extraction temporaries are recomputed per conv (scatter-free
    fold, ops/superbricks.sb_halo VJP)."""
    policy = jax.checkpoint_policies.save_only_these_names(ACT)

    def loss_fn(p, fd):
        return sb_frame_loss(p, cfg, fd, level_slices, compute_dtype)

    loss_remat = jax.checkpoint(loss_fn, policy=policy)

    @jax.jit
    def frame_step(params, opt, lr, k, fd):
        loss, grads = jax.value_and_grad(loss_remat)(params, fd)
        params, opt = adam_frame_update(params, opt, lr, grads, tc)
        k = k + 1
        lr = jnp.where(k % tc.step_size == 0, lr * tc.gamma, lr)
        return params, opt, lr, k, loss

    @jax.jit
    def slice_frame(arrays, i):
        return jax.tree_util.tree_map(lambda a: a[i], arrays)

    def epoch_fn(params, opt, lr, sched_count, batch: SbGopBatch):
        arrays = dict(
            nbr27=batch.nbr27,
            code=batch.code,
            occ=batch.occ,
            point_num=batch.point_num,
        )
        losses = []
        k = sched_count
        for i in range(batch.n_frames):
            fd = slice_frame(arrays, i)
            params, opt, lr, k, loss = frame_step(params, opt, lr, k, fd)
            losses.append(loss)
        lr = jnp.maximum(lr, tc.min_lr)
        return params, opt, lr, k, jnp.stack(losses)

    return epoch_fn
