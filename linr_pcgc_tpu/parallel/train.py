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

    F must be a multiple of the mesh size (pad the GOP by repeating frames
    if needed before calling; the loss average then slightly re-weights,
    which is the caller's choice to accept)."""
    d = mesh.devices.size
    arrays = batch_arrays(batch)
    f = batch.n_frames
    if f % d != 0:
        raise ValueError(f"gop size {f} not divisible by mesh size {d}")
    t = f // d
    sharding = NamedSharding(mesh, P(None, mesh.axis_names[0]))

    def reshape_and_place(x):
        x = x.reshape((t, d) + x.shape[1:])
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(reshape_and_place, arrays)


def make_epoch_fn_dp(cfg: ModelConfig, tc: TrainConfig, mesh: Mesh):
    """Jitted data-parallel epoch: scan over T super-steps of D frames."""
    replicated = NamedSharding(mesh, P())

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(params, opt, lr, sched_count, data):
        def body(carry, fd):
            params, opt, lr, k = carry

            def mean_loss(p):
                losses = jax.vmap(lambda one: frame_loss(p, cfg, one))(fd)
                return losses.mean(), losses

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
