"""GOP-parallel training: D chips each overfit a DIFFERENT GOP.

The reference's warm-start structure (main.py:98-104) makes every GOP
after the first INDEPENDENT: GOP 0 trains `first_epoch` epochs, then
each later GOP loads GOP 0's checkpoint (model + Adam state) and trains
`others_epoch` epochs on its own frames.  There is no cross-GOP data
flow after the warm start — so the GOP axis is the one axis of this
workload that parallelizes with zero collectives AND divides the
halo-gather rows that cap stage-parallel scaling (docs/DESIGN.md
"Multi-chip performance model").

Idiomatic form: ONE `shard_map` over a 1-D mesh where every leaf —
params, Adam state, LR, schedule counter, frame data — carries a leading
GOP axis sharded across chips.  Each chip runs the production sequential
frame step (runtime/sb_overfit.make_frame_grads_sb: fused stage chunks,
grouped gradient accumulation, torch-exact Adam/StepLR) on its own GOP;
the program compiles ONCE and contains no communication.  Per-GOP wall
time equals the single-chip time; sequence throughput is D x.

Requires the GOPs to share static shapes: assemble them together with
runtime/sb_overfit.assemble_gops_superbricks (common per-level buckets)
and equal gop_size (the CLI trains a ragged tail GOP sequentially).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

F32 = jnp.float32


def make_epoch_fn_gop_parallel(cfg, tc, level_slices, mesh: Mesh,
                               compute_dtype=jnp.bfloat16,
                               max_group_bricks: int | None = None,
                               stage_chunk: int | None = None,
                               slots: int = 64):
    """Epoch function over stacked per-GOP state.

    State/batch leaves carry a leading GOP axis of size D = mesh size:
    params/opt pytrees (D, ...), lr (D,), sched_count (D,) int32, and
    ``arrays`` = dict(nbr27 (D, F, Bb, 27), code, occ, point_num (D, F)).
    Returns updated state + losses (D, F).
    """
    from ..runtime.sb_overfit import make_frame_grads_sb
    from ..runtime.overfit import adam_frame_update

    frame_grads = make_frame_grads_sb(
        cfg, level_slices, compute_dtype, max_group_bricks, stage_chunk,
        slots,
    )
    axis = mesh.axis_names[0]

    def shard_fn(params, opt, lr, k, fd):
        # per chip: leading GOP axis of size 1 — squeeze, run the
        # sequential frame step, re-expand.  No collectives.
        sq = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
        p, o = sq(params), sq(opt)
        loss, grads = frame_grads(p, sq(fd))
        p, o = adam_frame_update(p, o, lr[0], grads, tc)
        k1 = k[0] + 1
        lr1 = jnp.where(k1 % tc.step_size == 0, lr[0] * tc.gamma, lr[0])
        ex = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)
        return ex(p), ex(o), lr1[None], k1[None], loss[None]

    frame_step = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis),) * 5,
            out_specs=(P(axis),) * 5,
            # no collectives anywhere in the body — disable the
            # varying-manual-axes type check, which otherwise rejects the
            # sequential trainer's scan over stage chunks (its zero init
            # carry is unvarying, the data-dependent output is varying)
            check_vma=False,
        )
    )

    def epoch_fn(params_s, opt_s, lr_s, k_s, arrays):
        n_frames = arrays["point_num"].shape[1]
        losses = []
        for i in range(n_frames):
            fd = {name: v[:, i] for name, v in arrays.items()}
            params_s, opt_s, lr_s, k_s, loss = frame_step(
                params_s, opt_s, lr_s, k_s, fd
            )
            losses.append(loss)
        lr_s = jnp.maximum(lr_s, tc.min_lr)  # per-epoch clamp (main.py:433)
        return params_s, opt_s, lr_s, k_s, jnp.stack(losses, axis=1)

    return epoch_fn


def make_epoch_fn_gop_sp(cfg, tc, level_slices, mesh: Mesh,
                         compute_dtype=jnp.bfloat16,
                         max_group_bricks: int | None = None,
                         slots: int = 64):
    """2-D (gop x sp) trainer: G concurrent warm GOPs, each trained
    stage-parallel across S chips — the full latency/throughput tradeoff
    curve on one mesh (``--devices G*S --parallel gop --gop_lanes G``).

    Mesh axes ("gop", "sp").  State and frame data carry a leading GOP
    axis sharded over "gop" and replicated over "sp"; inside the one
    shard_map each chip takes its stage base from
    ``lax.axis_index("sp")``, runs the fused cs = outstage/S stage chunk
    per level group (parallel/train.make_group_chunk_grads — the
    stage-parallel trainer's exact unit), psums bits + grads over "sp"
    ONLY, and applies the Adam step redundantly across its gop column
    (identical inputs -> identical params, no broadcast needed).  Per-GOP
    semantics are exactly the sequential trainer's, like sb_sp.

    Why: stage-parallel saturates with D (the halo exchange is gather
    row-rate bound, docs/DESIGN.md perf model) while the GOP axis scales
    linearly but cannot cut per-GOP latency.  The product lets v5e-8 run
    e.g. 4 GOPs x 2-way sp — near-linear throughput from the gop axis
    times the pre-saturation part of the sp curve.
    """
    from jax import shard_map
    from ..runtime.overfit import adam_frame_update
    from ..runtime.sb_overfit import level_groups
    from .train import make_group_chunk_grads

    g_ax, s_ax = mesh.axis_names
    s_mesh = mesh.shape[s_ax]
    assert cfg.outstage % s_mesh == 0, (cfg.outstage, s_mesh)
    cs = cfg.outstage // s_mesh

    total = level_slices[-1][1]
    small = total * slots <= 4096 * 512
    if max_group_bricks is None and small:
        max_group_bricks = total
    groups = level_groups(level_slices, max_group_bricks)
    group_fns = [
        (ga, gb,
         make_group_chunk_grads(cfg, sub_slices, cs, s_ax, compute_dtype,
                                slots))
        for (ga, gb, sub_slices) in groups
    ]

    def shard_fn(params, opt, lr, k, fd):
        sq = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
        p, o, f = sq(params), sq(opt), sq(fd)
        base = jax.lax.axis_index(s_ax).astype(jnp.int32) * cs
        bits_total = jnp.zeros((), jnp.float32)
        grads = jax.tree_util.tree_map(jnp.zeros_like, p)
        p_in = p
        for (ga, gb, chunk_grads) in group_fns:
            nbr = f["nbr27"][ga:gb]
            sub = dict(
                nbr27=jnp.where(nbr >= 0, nbr - jnp.int32(ga), -1),
                code=f["code"][ga:gb],
                occ=f["occ"][ga:gb],
            )
            bits, g = chunk_grads(p_in, sub, base)
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
            bits_total = bits_total + bits
            p_in, grads, bits_total = jax.lax.optimization_barrier(
                (p_in, grads, bits_total)
            )
        loss = bits_total / f["point_num"]
        grads = jax.tree_util.tree_map(
            lambda gi: gi / f["point_num"], grads
        )
        p, o = adam_frame_update(p, o, lr[0], grads, tc)
        k1 = k[0] + 1
        lr1 = jnp.where(k1 % tc.step_size == 0, lr[0] * tc.gamma, lr[0])
        ex = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)
        return ex(p), ex(o), lr1[None], k1[None], loss[None]

    frame_step = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(g_ax),) * 5,
            out_specs=(P(g_ax),) * 5,
            # the sp-axis psums close over the "gop"-varying params; the
            # strict varying-manual-axes typing rejects that mix for the
            # same reason as the sequential scan carry (see
            # make_epoch_fn_gop_parallel) — the redundant-update argument
            # above is the correctness proof
            check_vma=False,
        )
    )

    def epoch_fn(params_s, opt_s, lr_s, k_s, arrays):
        n_frames = arrays["point_num"].shape[1]
        losses = []
        for i in range(n_frames):
            fd = {name: v[:, i] for name, v in arrays.items()}
            params_s, opt_s, lr_s, k_s, loss = frame_step(
                params_s, opt_s, lr_s, k_s, fd
            )
            losses.append(loss)
        lr_s = jnp.maximum(lr_s, tc.min_lr)
        return params_s, opt_s, lr_s, k_s, jnp.stack(losses, axis=1)

    return epoch_fn


def stack_gop_state(params, opt, lr: float, sched_count: int, d: int,
                    mesh: Mesh):
    """Replicate ONE warm-start state onto the GOP axis (every GOP after
    the first starts from GOP 0's checkpoint, reference main.py:98-104)
    and shard it across the mesh."""
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))

    def rep(a):
        a = jnp.asarray(a)
        return jax.device_put(
            jnp.broadcast_to(a[None], (d,) + a.shape), sh
        )

    params_s = jax.tree_util.tree_map(rep, params)
    opt_s = jax.tree_util.tree_map(rep, opt)
    lr_s = jax.device_put(jnp.full((d,), lr, F32), sh)
    k_s = jax.device_put(jnp.full((d,), sched_count, jnp.int32), sh)
    return params_s, opt_s, lr_s, k_s


def shard_gop_batches(batches, mesh: Mesh) -> dict:
    """Stack D SbGopBatch (assembled with COMMON level_slices) on a
    leading GOP axis and shard it: each chip holds exactly its own GOP's
    frames — per-chip HBM equals single-GOP training."""
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    ls = batches[0].level_slices
    assert all(b.level_slices == ls for b in batches), (
        "GOP batches must share level_slices — assemble them together "
        "with assemble_gops_superbricks"
    )

    def stk(name):
        return jax.device_put(
            np.stack([np.asarray(getattr(b, name)) for b in batches]), sh
        )

    return dict(
        nbr27=stk("nbr27"),
        code=stk("code"),
        occ=stk("occ"),
        point_num=stk("point_num"),
    )


def gop_slice(tree, g: int):
    """Per-GOP view of a stacked pytree (checkpoint extraction)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a[g]), tree)


def overfit_gops_parallel(
    dataset,
    group_ranges: list,
    epoch_num: int,
    cfg,
    tc,
    result_dir: str,
    warm_start_path: str,
    bitdepth: int = 8,
    handle_dir: str | None = None,
    train_dtype: str = "bf16",
    sp_devices: int = 1,
    logger=None,
) -> list[str]:
    """Overfit len(group_ranges) GOPs concurrently, one per device (or
    per ``sp_devices``-chip stage-parallel lane when ``sp_devices > 1``
    — the 2-D gop x sp mesh), all warm-started from ``warm_start_path``
    — the warm phase of the reference GOP loop (main.py:98-104) at
    len(group_ranges) x sequence throughput.

    Writes the same per-GOP artifacts as ``runtime.overfit_gop``
    (gop_*/model.npz checkpoints, result.json loss trajectories, base
    layer cache) so encode/decode and mid-test drive the outputs
    unchanged.  Returns the checkpoint paths.
    """
    from ..models import init_params
    from ..runtime.codec import encode_low_all_frames
    from ..runtime.overfit import load_checkpoint, save_checkpoint
    from ..runtime.sb_overfit import assemble_gops_superbricks
    from .mesh import make_mesh
    import json

    log = logger.info if logger is not None else print
    d = len(group_ranges)
    assert cfg.kernel_size == 3 and cfg.outstage == 8 and (
        cfg.block_type != "dilation"
    ), "gop-parallel runs the superbrick backend only"
    sizes = {len(gr) for gr in group_ranges}
    assert len(sizes) == 1, (
        f"gop-parallel needs equal gop sizes, got {sizes} — train the "
        "ragged tail sequentially"
    )

    pyr_groups = [[dataset[i] for i in gr] for gr in group_ranges]
    gop_size = len(pyr_groups[0])

    gop_dirs, model_paths = [], []
    for gr, pyrs in zip(group_ranges, pyr_groups):
        gop_flag = f"gop_{gr[0]}_{gr[-1]}"
        gop_dir = os.path.join(result_dir, gop_flag)
        os.makedirs(gop_dir, exist_ok=True)
        gop_dirs.append(gop_dir)
        model_paths.append(os.path.join(gop_dir, "model.npz"))
        # base-layer pre-pass with on-disk reuse (main.py:162-216)
        buffer_dir = handle_dir or gop_dir
        os.makedirs(buffer_dir, exist_ok=True)
        xyzlow_path = os.path.join(buffer_dir, f"{gop_flag}_xyzlow.bin")
        if not os.path.exists(xyzlow_path):
            with open(xyzlow_path, "wb") as f:
                f.write(encode_low_all_frames(pyrs))

    batches = assemble_gops_superbricks(pyr_groups)
    compute_dtype = jnp.bfloat16 if train_dtype == "bf16" else jnp.float32
    if sp_devices > 1:
        from .mesh import make_mesh_gop_sp

        mesh = make_mesh_gop_sp(d, sp_devices)
        epoch_fn = make_epoch_fn_gop_sp(
            cfg, tc, batches[0].level_slices, mesh,
            compute_dtype=compute_dtype,
        )
    else:
        mesh = make_mesh(d)
        epoch_fn = make_epoch_fn_gop_parallel(
            cfg, tc, batches[0].level_slices, mesh,
            compute_dtype=compute_dtype,
        )
    arrays = shard_gop_batches(batches, mesh)

    template = init_params(jax.random.PRNGKey(0), cfg)
    params, opt, meta = load_checkpoint(warm_start_path, template)
    log(f"gop-parallel: {d} GOPs x {gop_size} frames"
        + (f" x {sp_devices}-way sp" if sp_devices > 1 else "")
        + f", warm from {warm_start_path} (lr={meta['lr']:.6f})")
    params_s, opt_s, lr_s, k_s = stack_gop_state(
        params, opt, meta["lr"], 0, d, mesh
    )

    best = [float("inf")] * d
    results = [[] for _ in range(d)]
    train_time = 0.0
    for epoch in range(epoch_num):
        st = time.time()
        params_s, opt_s, lr_s, k_s, losses = epoch_fn(
            params_s, opt_s, lr_s, k_s, arrays
        )
        losses = np.asarray(losses)  # (D, F)
        train_time += time.time() - st
        means = losses.mean(axis=1)
        log(
            f"epoch {epoch}: losses {np.round(means, 4).tolist()} "
            f"train_time {train_time:.1f}s "
            f"({train_time / ((epoch + 1) * d * gop_size):.3f} "
            f"s/frame/epoch/gop effective)"
        )
        for g in range(d):
            results[g].append(
                {
                    "epoch": epoch,
                    "loss": float(means[g]),
                    "train_time": train_time,
                    "train_time_avg": train_time / (d * gop_size),
                }
            )
            if means[g] < best[g]:
                best[g] = float(means[g])
                save_checkpoint(
                    model_paths[g],
                    gop_slice(params_s, g),
                    gop_slice(opt_s, g),
                    float(np.asarray(lr_s[g])),
                    epoch,
                    best[g],
                    bitdepth,
                )
        for g, gop_dir in enumerate(gop_dirs):
            with open(os.path.join(gop_dir, "result.json"), "w") as f:
                json.dump(results[g], f, indent=4)
    for g, path in enumerate(model_paths):
        if not os.path.exists(path):
            save_checkpoint(
                path, gop_slice(params_s, g), gop_slice(opt_s, g),
                float(np.asarray(lr_s[g])), epoch_num - 1, best[g], bitdepth,
            )
    return model_paths
