"""Measure the direction-blocked sm3 halo + conv against the flat-group
baseline at production level-0 shapes, plus the fused chunk under both
modes (round-5 training campaign; see docs/PROF_DECOMP_r05.json for the
baseline decomposition).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_halo_sm3.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bricks", type=int, default=81920)
    ap.add_argument("--cs", type=int, default=8)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--probes", type=str, default="halo,conv,chunk")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from linr_pcgc_tpu.utils.jax_cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    )

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.models.sb_network import ACT, sb_fused_chunk_bits
    from linr_pcgc_tpu.ops.superbricks import (
        B4_SLOTS,
        _b4_halo_sm_forward,
        _b4_halo_sm3_forward,
        b4_convsm,
    )

    bb, cs, r = args.bricks, args.cs, args.reps
    s = 1 + cs
    c = o = 8
    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)
    nbr_np = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr_np[rng.uniform(size=(bb, 27)) < 0.25] = -1
    nbr = jnp.asarray(nbr_np)
    w = jnp.asarray(rng.normal(size=(s, 27, c, o)) * 0.1, jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(bb, s, B4_SLOTS * c)), bf16)

    cfg = ModelConfig(scale_num=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    code = jnp.asarray(
        rng.integers(0, 128, (bb, B4_SLOTS), dtype=np.int64), jnp.int32
    )
    occ = jnp.asarray(rng.integers(0, 2, (bb, 8, B4_SLOTS), dtype=np.uint8))
    level_slices = [(0, bb, 0)]
    policy = jax.checkpoint_policies.save_only_these_names(ACT)

    def timed(name, step, carry0, *ops):
        def run(n):
            f = jax.jit(
                lambda c0, *a: lax.scan(
                    lambda cc, _: (step(cc, *a), ()), c0, None, length=n
                )[0]
            )
            y = f(carry0, *ops)
            np.asarray(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[:1])
            t0 = time.time()
            y = f(carry0, *ops)
            np.asarray(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[:1])
            return time.time() - t0

        t1 = run(r)
        t2 = run(2 * r)
        ms = (t2 - t1) / r * 1000
        print(f"{name}: {ms:.1f} ms", file=sys.stderr, flush=True)
        return round(ms, 1)

    results = {}
    want = set(args.probes.split(","))

    if "halo" in want:
        def old_step(x, nbr_):
            h = lax.optimization_barrier(_b4_halo_sm_forward(x, nbr_))
            return x + h[:, :, : B4_SLOTS * c]

        def new_step(x, nbr_):
            h = lax.optimization_barrier(_b4_halo_sm3_forward(x, nbr_))
            return x + h[:, :, : B4_SLOTS * c]

        results["halo_flat"] = timed("halo_flat", old_step, x0, nbr)
        results["halo_sm3"] = timed("halo_sm3", new_step, x0, nbr)

    if "conv" in want:
        def conv_loss(x, w_, nbr_):
            y = b4_convsm(x, w_, nbr_).astype(jnp.float32)
            return jnp.sum(y * y)

        cvg = jax.value_and_grad(conv_loss)

        def convvg_step(x, w_, nbr_):
            _, gr = cvg(x, w_, nbr_)
            return x + jnp.bfloat16(1e-3) * gr.astype(bf16)

        for mode in ("flat", "sm3"):
            os.environ["LINR_HALO"] = mode
            try:
                def cstep(x, w_, nbr_):
                    return b4_convsm(x, w_, nbr_)

                results[f"conv_fwd_{mode}"] = timed(
                    f"conv_fwd_{mode}", cstep, x0, w, nbr
                )
                results[f"conv_vg_{mode}"] = timed(
                    f"conv_vg_{mode}", convvg_step, x0, w, nbr
                )
            finally:
                os.environ.pop("LINR_HALO", None)

    if "chunk" in want:
        for mode in ("sm3", "flat"):
            os.environ["LINR_HALO"] = mode
            try:
                def cv_loss(p, occ_t):
                    mask = (code >= 0).astype(bf16)[:, None, None, :]
                    geom = dict(nbr27=nbr, mask=mask, code=code, dtype=bf16)
                    f = jax.checkpoint(
                        lambda pp: sb_fused_chunk_bits(
                            pp, cfg, geom, occ_t, jnp.int32(0), cs,
                            level_slices,
                        ),
                        policy=policy,
                    )
                    return jax.value_and_grad(f)(p)

                def cvg_step(p, occ_t):
                    _, g = cv_loss(p, occ_t)
                    return jax.tree_util.tree_map(
                        lambda a, b: a - 1e-30 * b, p, g
                    )

                results[f"chunk_vg_{mode}"] = timed(
                    f"chunk_vg_{mode}", cvg_step, params, occ
                )
            finally:
                os.environ.pop("LINR_HALO", None)

    rec = {
        "what": "direction-blocked sm3 halo vs flat-group halo at "
                "production level-0 shapes",
        "bricks": bb,
        "cs": cs,
        "stage_rows": s,
        "dtype": "bf16",
        "ms": results,
    }
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
