"""GOP assembly and training on the brick layout (the TPU fast path).

Mirrors runtime/overfit.py's assemble_gop/make_epoch_fn but with voxels
organized into 4^3 bricks (ops/bricks.py, models/brick_network.py).
Identical optimization semantics — the loss over occupied slots equals the
flat voxel loss, so Adam/StepLR trajectories match the parity trainer.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..data.dataset import FramePyramid, bucket_size
from ..models import ModelConfig
from ..models.brick_network import brick_training_bits
from ..ops.bricks import build_brick_level, SLOTS
from .overfit import TrainConfig, adam_frame_update

F32 = jnp.float32


def _brick_bucket(n: int) -> int:
    # brick counts are ~10-20x smaller than voxel counts; finer buckets
    if n <= 256:
        return 256
    p = 1 << (int(n - 1).bit_length() - 1)
    step = max(256, p // 4)
    return ((n + step - 1) // step) * step


@dataclasses.dataclass
class BrickGopBatch:
    nbr27: jax.Array     # (F, Bb, 27) int32 flat-global brick map, -1 absent
    mask: jax.Array      # (F, Bb, 64) uint8 occupied-slot mask
    code: jax.Array      # (F, Bb, 64) int32 scale*128+feat, -1 empty
    occ: jax.Array       # (F, Bb, 8, 64) uint8
    point_num: jax.Array  # (F,) float32
    level_slices: tuple  # static ((start, end), ...) per scale

    @property
    def n_frames(self):
        return self.nbr27.shape[0]


def assemble_gop_bricks(pyramids: list[FramePyramid]) -> BrickGopBatch:
    s_num = pyramids[0].scale_num
    assert all(p.scale_num == s_num for p in pyramids)

    # brickify every (frame, level) on the host
    bl = [
        [
            build_brick_level(
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
        _brick_bucket(max(bl[f][s].n_bricks for f in range(len(pyramids))))
        for s in range(s_num)
    ]
    offsets = np.cumsum([0] + buckets[:-1]).astype(np.int64)
    total = int(sum(buckets))
    level_slices = tuple(
        (int(offsets[s]), int(offsets[s] + buckets[s])) for s in range(s_num)
    )

    f_nbr, f_mask, f_code, f_occ = [], [], [], []
    for f in range(len(pyramids)):
        nbr = np.full((total, 27), -1, np.int32)
        mask = np.zeros((total, SLOTS), np.uint8)
        code = np.full((total, SLOTS), -1, np.int32)
        occ = np.zeros((total, 8, SLOTS), np.uint8)
        for s in range(s_num):
            lev = bl[f][s]
            a = int(offsets[s])
            nb = lev.n_bricks
            loc = lev.nbr27
            nbr[a: a + nb] = np.where(loc >= 0, loc + np.int32(a), -1)
            mask[a: a + nb] = lev.slot_mask
            code[a: a + nb] = lev.scale_code
            occ[a: a + nb] = lev.occ
        f_nbr.append(nbr)
        f_mask.append(mask)
        f_code.append(code)
        f_occ.append(occ)

    return BrickGopBatch(
        nbr27=jnp.asarray(np.stack(f_nbr)),
        mask=jnp.asarray(np.stack(f_mask)),
        code=jnp.asarray(np.stack(f_code)),
        occ=jnp.asarray(np.stack(f_occ)),
        point_num=jnp.asarray(
            np.array([p.point_num for p in pyramids], np.float32)
        ),
        level_slices=level_slices,
    )


def brick_frame_loss(params, cfg: ModelConfig, fd: dict, level_slices,
                     compute_dtype=jnp.float32):
    geom = dict(
        nbr27=fd["nbr27"],
        mask=fd["mask"].astype(compute_dtype)[:, None, :],
        code=fd["code"],
        dtype=compute_dtype,
    )
    bits = brick_training_bits(
        params, cfg, geom, fd["occ"].astype(compute_dtype), level_slices
    )
    return bits / fd["point_num"]


def make_epoch_fn_bricks(cfg: ModelConfig, tc: TrainConfig, level_slices,
                         compute_dtype=jnp.bfloat16):
    """Same contract as overfit.make_epoch_fn, over a BrickGopBatch's
    arrays (see overfit.make_epoch_fn for why the frame loop is on the
    host).

    ``compute_dtype`` defaults to bfloat16: parameters and the Adam state
    stay f32 (mixed precision), activations/halos/matmuls run at bf16 —
    half the gather bytes and full MXU rate.  Pass float32 for
    bit-faithful parity studies (the codec path is always f32)."""

    @jax.jit
    def frame_step(params, opt, lr, k, fd):
        loss, grads = jax.value_and_grad(
            lambda p: brick_frame_loss(p, cfg, fd, level_slices, compute_dtype)
        )(params)
        params, opt = adam_frame_update(params, opt, lr, grads, tc)
        k = k + 1
        lr = jnp.where(k % tc.step_size == 0, lr * tc.gamma, lr)
        return params, opt, lr, k, loss

    @jax.jit
    def slice_frame(arrays, i):
        return jax.tree_util.tree_map(lambda a: a[i], arrays)

    def epoch_fn(params, opt, lr, sched_count, batch: BrickGopBatch):
        arrays = dict(
            nbr27=batch.nbr27,
            mask=batch.mask,
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
