"""Decompose the production per-frame training step at bench shapes:
x_glob fwd+vjp per group, chunk value_and_grad per (group, chunk), and
the assembled frame_step — to find where the 1.5 s/frame goes.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def sync(o):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(o)
    np.asarray(jnp.ravel(leaves[0])[:1])


def main():
    import jax
    import jax.numpy as jnp
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.runtime import TrainConfig, adam_init
    from linr_pcgc_tpu.runtime.sb_overfit import (
        assemble_gop_superbricks,
        make_frame_grads_sb,
        level_groups,
    )
    from linr_pcgc_tpu.models.sb_network import sb_chunk_bits, sb_x_glob, ACT

    n_points = int(os.environ.get("BENCH_POINTS", "800000"))
    frames = [synthetic_cloud(n_points, depth=10, seed=7, phase=0.0)]
    ds = PyramidDataset(frames, handle_dir=None)
    pyrs = [ds[0]]
    cfg = ModelConfig(scale_num=ds.scale_num)
    batch = assemble_gop_superbricks(pyrs, side=4)
    print(f"scale_num={ds.scale_num} total_bricks={batch.nbr27.shape[1]}",
          flush=True)
    groups = level_groups(batch.level_slices)
    print("groups:", [(a, b) for a, b, _ in groups], flush=True)

    params = init_params(jax.random.PRNGKey(0), cfg)
    cdt = jnp.bfloat16
    policy = jax.checkpoint_policies.save_only_these_names(ACT)
    stage_chunk = 4

    fd = dict(
        nbr27=batch.nbr27[0], code=batch.code[0], occ=batch.occ[0],
        point_num=batch.point_num[0],
    )

    def geom_of(sub):
        mask = (sub["code"] >= 0).astype(cdt)[:, None, None, :]
        return dict(nbr27=sub["nbr27"], mask=mask, code=sub["code"], dtype=cdt)

    def timeit(name, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.time()
        n = 3
        for _ in range(n):
            sync(fn(*a))
        print(f"{name:34s} {(time.time() - t0) / n * 1e3:9.1f} ms", flush=True)

    total = 0.0
    for gi, (ga, gb, sub_slices) in enumerate(groups):
        nbr = fd["nbr27"][ga:gb]
        sub = dict(
            nbr27=jnp.where(nbr >= 0, nbr - jnp.int32(ga), -1),
            code=fd["code"][ga:gb],
            occ=fd["occ"][ga:gb],
        )
        sub = jax.tree_util.tree_map(jnp.asarray, sub)

        xg_fn = jax.jit(lambda p, sb: sb_x_glob(p, cfg, geom_of(sb), sub_slices))
        timeit(f"g{gi} x_glob fwd ({gb-ga} bricks)", xg_fn, params, sub)
        xg = xg_fn(params, sub)

        def xg_loss(p, sb):
            return jnp.sum(sb_x_glob(p, cfg, geom_of(sb), sub_slices).astype(jnp.float32))

        timeit(f"g{gi} x_glob vg", jax.jit(jax.value_and_grad(xg_loss)), params, sub)

        def chunk_fn(p, xgv, sb, base):
            from linr_pcgc_tpu.ops.superbricks import unpack_bits

            return sb_chunk_bits(
                p, cfg, geom_of(sb), unpack_bits(sb["occ"]), base, stage_chunk,
                xgv,
            )

        cvg = jax.jit(jax.value_and_grad(
            jax.checkpoint(chunk_fn, policy=policy), argnums=(0, 1)))
        timeit(f"g{gi} chunk vg (cs={stage_chunk})", cvg, params, xg, sub,
               jnp.int32(0))
        cfwd = jax.jit(chunk_fn)
        timeit(f"g{gi} chunk fwd", cfwd, params, xg, sub, jnp.int32(0))

        def fchunk_fn(p, sb, base):
            from linr_pcgc_tpu.ops.superbricks import unpack_bits
            from linr_pcgc_tpu.models.sb_network import sb_fused_chunk_bits

            return sb_fused_chunk_bits(
                p, cfg, geom_of(sb), unpack_bits(sb["occ"]), base, 8,
                sub_slices,
            )

        fvg = jax.jit(jax.value_and_grad(
            jax.checkpoint(fchunk_fn, policy=policy)))
        timeit(f"g{gi} FUSED chunk vg (cs=8)", fvg, params, sub, jnp.int32(0))
        timeit(f"g{gi} FUSED chunk fwd", jax.jit(fchunk_fn), params, sub,
               jnp.int32(0))

    # full frame step
    frame_grads = make_frame_grads_sb(cfg, batch.level_slices, cdt)
    fg = jax.jit(frame_grads)
    timeit("frame_grads total", fg, params, fd)


if __name__ == "__main__":
    main()
