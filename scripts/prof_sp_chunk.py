"""Measure the stage-chunk cost curve cost(cs) for cs in {1,2,4,8} —
the number the multi-chip performance model rests on (round-3 verdict
next #6).

Under the stage-parallel trainer (parallel/train.py make_epoch_fn_sb_sp)
each of D chips runs a cs = outstage/D chunk of every level group.  The
halo exchange is gather ROW-rate bound (27 x Bb rows per conv regardless
of the stage-batch width), so cost(cs) = H + cs*M with a large
stage-invariant H: the sp speedup over one chip is
cost(8) / cost(8/D) — NOT D.  This script measures cost(cs) for the
production fused chunk (value_and_grad of sb_fused_chunk_bits, the
per-chip unit of work) at production level-0 shapes and prints the
implied per-chip speedup table.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_sp_chunk.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bricks", type=int, default=81920)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--out", default="docs/SP_MODEL_r04.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.models.sb_network import sb_fused_chunk_bits, ACT
    from linr_pcgc_tpu.ops.superbricks import B4_SLOTS

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    bb = args.bricks
    cfg = ModelConfig(scale_num=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    # synthetic level-0-like geometry: random occupancy, random neighbor
    # map (the gather row count, not the neighbor pattern, is what's
    # timed).  code = scale*128 + 7-bit neighbor feature, -1 empty.
    code = jnp.asarray(
        rng.integers(0, 128, (bb, B4_SLOTS), dtype=np.int64),
        dtype=jnp.int32,
    )
    nbr27 = jnp.asarray(
        rng.integers(0, bb, (bb, 27), dtype=np.int64), dtype=jnp.int32
    )
    occ = jnp.asarray(
        rng.integers(0, 2, (bb, 8, B4_SLOTS), dtype=np.uint8)
    )
    level_slices = [(0, bb, 0)]

    policy = jax.checkpoint_policies.save_only_these_names(ACT)

    results = {}
    for cs in (1, 2, 4, 8):
        @jax.jit
        def vg(p, occ_t, base, _cs=cs):
            mask = (code >= 0).astype(dt)[:, None, None, :]
            geom = dict(nbr27=nbr27, mask=mask, code=code, dtype=dt)
            f = jax.checkpoint(
                lambda pp: sb_fused_chunk_bits(
                    pp, cfg, geom, occ_t, base, _cs, level_slices
                ),
                policy=policy,
            )
            return jax.value_and_grad(f)(p)

        base = jnp.int32(0)
        out = vg(params, occ, base)  # compile
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        np.asarray(jnp.ravel(out[0]))  # force host read through the tunnel
        t0 = time.time()
        for _ in range(args.reps):
            out = vg(params, occ, base)
        np.asarray(jnp.ravel(out[0]))
        dt_s = (time.time() - t0) / args.reps
        results[cs] = round(dt_s * 1000, 1)
        print(f"cs={cs}: {dt_s*1000:.1f} ms", file=sys.stderr, flush=True)

    c8 = results[8]
    table = {
        f"D={8 // cs}": {
            "cs_per_chip": cs,
            "chunk_ms": results[cs],
            "sp_speedup_vs_1chip": round(c8 / results[cs], 2),
        }
        for cs in (1, 2, 4, 8)
    }
    rec = {
        "what": "value_and_grad(sb_fused_chunk_bits) ms at production "
                "level-0 shapes vs stage-chunk width cs; sp per-chip "
                "unit = cs=8/D chunk, so sp speedup = cost(8)/cost(8/D)",
        "hw": "v5e-1 via axon tunnel (compute-only: one host read "
              "of the scalar bits per rep)",
        "bricks": args.bricks,
        "dtype": args.dtype,
        "chunk_ms": results,
        "sp_model": table,
    }
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
