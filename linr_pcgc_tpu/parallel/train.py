"""Frame-parallel GOP training over a device mesh.

Semantics: the sequential parity trainer (runtime/overfit.py) does one Adam
step per frame, exactly like the reference.  The data-parallel trainer
groups ``D`` frames (D = mesh size) per optimizer step and averages their
gradients — the classic large-batch trade: D x fewer steps per epoch, each
step D x cheaper in wall clock.  The LR schedule counts optimizer steps, so
``step_size`` should be divided by D to keep the same decay-per-epoch
cadence when comparing against the sequential trainer.

Sharding layout: parameters and optimizer state replicated; the GOP batch
reshaped to (T, D, N, ...) with the D axis sharded over the ``dp`` mesh
axis.  The per-step mean over D induces one gradient ``psum`` over ICI —
inserted by XLA from the sharding annotations, not hand-written.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import ModelConfig
from ..runtime.overfit import (
    GopBatch,
    TrainConfig,
    adam_frame_update,
    batch_arrays,
    frame_loss,
)


def shard_gop(batch: GopBatch, mesh: Mesh):
    """Reshape (F, ...) -> (T, D, ...) and place with the D axis sharded.

    When F is not a multiple of the mesh size D, the tail super-step is
    padded with copies of frame 0 carrying ``loss_weight`` 0 — they occupy
    a parallel lane (no extra wall-clock) and contribute exactly zero to
    the weighted gradient, so the optimizer trajectory is a function of
    the real frames only (no silent re-weighting).
    """
    d = mesh.devices.size
    arrays = batch_arrays(batch)
    f = batch.n_frames
    pad = (-f) % d
    weights = jnp.concatenate(
        [jnp.ones((f,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )
    if pad:
        arrays = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]
            ),
            arrays,
        )
    arrays = dict(arrays, loss_weight=weights)
    t = (f + pad) // d
    sharding = NamedSharding(mesh, P(None, mesh.axis_names[0]))

    def reshape_and_place(x):
        x = x.reshape((t, d) + x.shape[1:])
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(reshape_and_place, arrays)


def make_epoch_fn_dp(cfg: ModelConfig, tc: TrainConfig, mesh: Mesh):
    """Jitted data-parallel epoch: scan over T super-steps of D frames.

    Each super-step takes ONE Adam step on the weighted-mean gradient of
    its D frames (weights are 1 for real frames, 0 for padding).  The LR
    schedule counts optimizer steps, so callers should divide
    ``step_size`` by D to keep the reference's decay-per-epoch cadence
    (runtime.overfit.dp_train_config does this conversion).
    """
    replicated = NamedSharding(mesh, P())

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(params, opt, lr, sched_count, data):
        def body(carry, fd):
            params, opt, lr, k = carry
            w = fd.pop("loss_weight")

            def mean_loss(p):
                losses = jax.vmap(lambda one: frame_loss(p, cfg, one))(fd)
                return jnp.sum(losses * w) / jnp.sum(w), losses

            (_, losses), grads = jax.value_and_grad(mean_loss, has_aux=True)(
                params
            )
            params, opt = adam_frame_update(params, opt, lr, grads, tc)
            k = k + 1
            lr = jnp.where(k % tc.step_size == 0, lr * tc.gamma, lr)
            return (params, opt, lr, k), losses

        (params, opt, lr, k), losses = jax.lax.scan(
            body, (params, opt, lr, sched_count), data
        )
        lr = jnp.maximum(lr, tc.min_lr)
        return params, opt, lr, k, losses

    def run(params, opt, lr, sched_count, data):
        params = jax.device_put(params, replicated)
        opt = jax.device_put(opt, replicated)
        return epoch_fn(params, opt, lr, sched_count, data)

    return run
