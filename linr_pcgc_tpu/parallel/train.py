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


def make_group_chunk_grads(cfg: ModelConfig, sub_slices, cs: int,
                           axis: str, compute_dtype=jnp.bfloat16,
                           slots: int = 64):
    """value_and_grad of ONE cs-stage chunk of one level group, for use
    INSIDE a shard_map body whose stage axis is ``axis``: returns
    ``chunk_grads(params, sub, base) -> (bits, grads)`` where ``bits``
    and ``grads`` are already psum'd over ``axis``.

    Fused when eligible (default 1-layer inception block_in): block_in +
    the chip's cs stages in one pass — block_in's redundant recompute
    rides the chip's own halo exchanges (row-rate bound) for ~free and
    its gradient arrives inside the param psum, so exactly TWO psums ride
    ICI per call (scalar bits + ~220 KB grads).  The split path (other
    block types) additionally psums the x_glob cotangent and folds it
    through block_in's VJP replicated.  Shared by the stage-parallel
    trainer and the gop x sp 2-D trainer (gop_parallel.py)."""
    from ..models.sb_network import (
        sb_chunk_bits,
        sb_fused_chunk_bits,
        sb_x_glob,
        ACT,
    )
    from ..ops.superbricks import unpack_bits

    policy = jax.checkpoint_policies.save_only_these_names(ACT)
    fused = (
        slots == 64
        and cfg.block_layers == 1
        and cfg.block_type == "inception"
    )

    def geom_of(sub):
        mask = (sub["code"] >= 0).astype(compute_dtype)[:, None, None, :]
        return dict(
            nbr27=sub["nbr27"], mask=mask, code=sub["code"],
            dtype=compute_dtype,
        )

    if fused:
        def fchunk_fn(p, sub, base):
            return sb_fused_chunk_bits(
                p, cfg, geom_of(sub), unpack_bits(sub["occ"]), base,
                cs, sub_slices,
            )

        fchunk_vg = jax.value_and_grad(
            jax.checkpoint(fchunk_fn, policy=policy)
        )

        def chunk_grads(params, sub, base):
            bits, gp = fchunk_vg(params, sub, base)
            bits = jax.lax.psum(bits, axis)
            grads = jax.lax.psum(gp, axis)
            return bits, grads
    else:
        xg_fwd = jax.checkpoint(
            lambda p, sub: sb_x_glob(p, cfg, geom_of(sub), sub_slices),
            policy=policy,
        )

        def chunk_fn(p, xg, sub, base):
            return sb_chunk_bits(
                p, cfg, geom_of(sub), unpack_bits(sub["occ"]), base,
                cs, xg,
            )

        chunk_vg = jax.value_and_grad(
            jax.checkpoint(chunk_fn, policy=policy), argnums=(0, 1)
        )

        def chunk_grads(params, sub, base):
            x_glob, bi_vjp = jax.vjp(lambda p: xg_fwd(p, sub), params)
            bits, (gp, gx) = chunk_vg(params, x_glob, sub, base)
            bits = jax.lax.psum(bits, axis)
            gp = jax.lax.psum(gp, axis)
            gx = jax.lax.psum(gx, axis)
            grads = jax.tree_util.tree_map(jnp.add, gp, bi_vjp(gx)[0])
            return bits, grads

    return chunk_grads


def make_epoch_fn_sb_sp(cfg: ModelConfig, tc: TrainConfig, level_slices,
                        mesh: Mesh, compute_dtype=jnp.bfloat16,
                        max_group_bricks: int | None = None,
                        slots: int = 64):
    """STAGE-PARALLEL superbrick trainer: multi-chip training with the
    sequential trainer's EXACT semantics (the production ``devices > 1``
    default; round-2 verdict #1).

    Why not frame-DP: this workload is *optimization-bound* (pure
    overfitting, no gradient noise to average away), so D-frame
    mean-gradient steps are a pure rate loss — measured on the 8-CPU
    mesh, DP-vs-sequential loss ratio GROWS 1.13 -> 4.3 over 40 epochs
    (D x fewer Adam steps ~= D x fewer epochs of progress), and applying
    the D stale gradients sequentially overshoots worse.  No frame-axis
    scheme can match the reference trajectory.

    Instead, parallelize WITHIN the frame: the frame gradient is an
    exact sum over (level-group x stage-chunk) units
    (runtime/sb_overfit.make_frame_grads_sb) that the single chip runs
    *sequentially* purely for HBM reasons.  Here each chip owns
    ``outstage / D`` stages of every level group: a ``shard_map`` over
    the 1-D mesh runs the existing traced-chunk machinery per chip on
    its own stage base, ``psum``s the unit gradients over ICI, and one
    Adam step per frame follows — identical math, identical schedule,
    identical trajectory (up to float reduction order) to the
    sequential trainer.  The stage-independent x_glob (input embedding +
    block_in, ~10% of the work) is recomputed per chip — redundant
    compute instead of a second collective; its VJP fold runs
    replicated on the psum'd cotangent.

    Per-chip peak HBM is one (group x D-th-of-stages) unit — SMALLER
    than single-chip training (which runs ``stage_chunk`` stages per
    unit).  Requires D | outstage; callers fall back to frame-DP
    otherwise.

    Collectives (the multi-chip cost model, docs/DESIGN.md): on the
    default fused path, per (frame x level group) exactly TWO psums ride
    ICI — the scalar chunk bits and the ~55k-param gradient pytree
    (~220 KB f32) — because block_in's gradient is computed INSIDE each
    chip's fused chunk (its x_glob row rides the chip's own halo
    exchanges, sb_fused_chunk_logits), not folded through a separate
    x_glob VJP.  The pre-fused split path (non-inception block_in)
    additionally psums the x_glob cotangent — (group bricks, slots*ch)
    bf16, ~84 MB at the level-0 production group — which the fused path
    eliminates.
    """
    from jax import shard_map
    from ..runtime.sb_overfit import level_groups
    from ..runtime.overfit import adam_frame_update as adam_update

    d_mesh = mesh.devices.size
    assert cfg.outstage % d_mesh == 0, (cfg.outstage, d_mesh)
    cs = cfg.outstage // d_mesh  # stages per chip
    axis = mesh.axis_names[0]

    total = level_slices[-1][1]
    small = total * slots <= 4096 * 512
    if max_group_bricks is None and small:
        max_group_bricks = total
    groups = level_groups(level_slices, max_group_bricks)

    def make_group_fn(sub_slices):
        chunk_grads = make_group_chunk_grads(
            cfg, sub_slices, cs, axis, compute_dtype, slots
        )

        def shard_fn(params, sub, base):
            # per chip: its own cs-stage chunk of this level group
            return chunk_grads(params, sub, base[0])

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs=(P(), P()),
        )

    group_fns = [
        (ga, gb, make_group_fn(sub_slices))
        for (ga, gb, sub_slices) in groups
    ]
    bases = jnp.arange(d_mesh, dtype=jnp.int32) * cs

    @jax.jit
    def frame_step(params, opt, lr, k, fd):
        bits_total = jnp.zeros((), jnp.float32)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        p_in = params
        for (ga, gb, fn) in group_fns:
            nbr = fd["nbr27"][ga:gb]
            sub = dict(
                nbr27=jnp.where(nbr >= 0, nbr - jnp.int32(ga), -1),
                code=fd["code"][ga:gb],
                occ=fd["occ"][ga:gb],
            )
            bits, g = fn(p_in, sub, bases)
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
            bits_total = bits_total + bits
            p_in, grads, bits_total = jax.lax.optimization_barrier(
                (p_in, grads, bits_total)
            )
        loss = bits_total / fd["point_num"]
        grads = jax.tree_util.tree_map(
            lambda gi: gi / fd["point_num"], grads
        )
        params, opt = adam_update(params, opt, lr, grads, tc)
        k = k + 1
        lr = jnp.where(k % tc.step_size == 0, lr * tc.gamma, lr)
        return params, opt, lr, k, loss

    replicated = NamedSharding(mesh, P())

    def epoch_fn(params, opt, lr, sched_count, batch):
        params = jax.device_put(params, replicated)
        opt = jax.device_put(opt, replicated)
        arrays = dict(
            nbr27=jax.device_put(batch.nbr27, replicated),
            code=jax.device_put(batch.code, replicated),
            occ=jax.device_put(batch.occ, replicated),
            point_num=jax.device_put(batch.point_num, replicated),
        )
        losses = []
        k = sched_count
        for i in range(batch.n_frames):
            fd = {key: v[i] for key, v in arrays.items()}
            params, opt, lr, k, loss = frame_step(params, opt, lr, k, fd)
            losses.append(loss)
        lr = jnp.maximum(lr, tc.min_lr)
        return params, opt, lr, k, jnp.stack(losses)

    return epoch_fn


def shard_sb_gop(batch, mesh: Mesh):
    """Superbrick analogue of ``shard_gop``: SbGopBatch arrays (F, ...)
    -> (T, D, ...) with the D axis sharded over the mesh and zero-weight
    padding frames when F % D != 0 (same no-silent-reweighting argument).
    Returns (data dict, static level_slices)."""
    d = mesh.devices.size
    arrays = dict(
        nbr27=batch.nbr27, code=batch.code, occ=batch.occ,
        point_num=batch.point_num,
    )
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


def make_epoch_fn_sb_dp(cfg: ModelConfig, tc: TrainConfig, level_slices,
                        mesh: Mesh, compute_dtype=jnp.bfloat16,
                        stage_chunk: int | None = None):
    """Frame-data-parallel epoch on the SUPERBRICK backend — the
    production fast path multiplied across chips (round-2 verdict #1: DP
    previously forced the slow flat-gather network).

    Structure: the per-frame gradient core is
    ``runtime.sb_overfit.make_frame_grads_sb`` — the exact
    (level-group x stage-chunk) accumulation the single-chip trainer
    runs, so per-DEVICE peak HBM is identical to single-chip training —
    vmapped over the D sharded frames of a super-step (params in_axes
    None).

    Update semantics: weighted-MEAN gradient, one Adam step per
    super-step (divide ``step_size`` by D — dp_train_config — to keep the
    reference's decay-per-frames-seen cadence).  The mean induces one
    psum over ICI, inserted by XLA from the sharding annotations.
    Large-batch DP trades D x fewer Adam steps for parallel wall-clock;
    on COLD starts the first epochs trail the sequential trainer (fewer
    curvature-aware steps — a delayed-sequential variant that applied
    the D stale gradients as D sequential Adam steps was measured to
    overshoot far worse, 14.2 vs 10.2 vs sequential 8.5 at epoch 6), but
    the gap closes at convergence, which is the production regime: GOP 0
    trains ``first_epoch`` ~ 100 epochs and every later GOP warm-starts
    from the converged model (tests/test_parallel.py proves the <5%
    bound at convergence and exact numeric agreement per super-step).
    Zero-weight padding frames (F % D != 0) contribute nothing to the
    weighted mean.

    Super-steps loop on the HOST (a ``lax.scan`` over frames crashed the
    TPU runtime at production scale, docs/DESIGN.md) with donated
    carries; per-epoch dispatch cost is T tiny calls.
    """
    from ..runtime.sb_overfit import make_frame_grads_sb

    replicated = NamedSharding(mesh, P())
    frame_grads = make_frame_grads_sb(
        cfg, level_slices, compute_dtype, stage_chunk=stage_chunk
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def super_step(params, opt, lr, k, fd):
        w = fd.pop("loss_weight")
        losses, grads = jax.vmap(frame_grads, in_axes=(None, 0))(params, fd)
        wsum = jnp.sum(w)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.einsum("d,d...->...", w, g) / wsum, grads
        )
        params, opt = adam_frame_update(params, opt, lr, grads, tc)
        k = k + 1
        lr = jnp.where(k % tc.step_size == 0, lr * tc.gamma, lr)
        return params, opt, lr, k, losses

    def epoch_fn(params, opt, lr, sched_count, data):
        params = jax.device_put(params, replicated)
        opt = jax.device_put(opt, replicated)
        t = data["point_num"].shape[0]
        losses = []
        k = sched_count
        for i in range(t):
            fd = {key: v[i] for key, v in data.items()}
            params, opt, lr, k, step_losses = super_step(
                params, opt, lr, k, fd
            )
            losses.append(step_losses)
        lr = jnp.maximum(lr, tc.min_lr)
        return params, opt, lr, k, jnp.stack(losses)

    return epoch_fn


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
