"""Isolate the codec's per-stage probability cost (sb_chunk_logits fwd,
cs=2) at level-0 codec shapes — bisects the round-5 probs regression
(attribution: dec_probs_s0 1.10 -> 2.86 s/frame) across the merged
small-fragment gather (LINR_HALO_MERGE) and the first=True variant.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_probs.py
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
    ap.add_argument("--cs", type=int, default=2)
    ap.add_argument("--reps", type=int, default=8)
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
    from linr_pcgc_tpu.models.sb_network import sb_chunk_logits, _sb_block, _stack1

    bb, cs, r = args.bricks, args.cs, args.reps
    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)
    cfg = ModelConfig(scale_num=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    code = jnp.asarray(
        rng.integers(0, 128, (bb, 64), dtype=np.int64), jnp.int32
    )
    nbr_np = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr_np[rng.uniform(size=(bb, 27)) < 0.25] = -1
    nbr = jnp.asarray(nbr_np)
    occ = jnp.asarray(rng.integers(0, 2, (bb, 8, 64), dtype=np.uint8))
    xg = jnp.asarray(rng.normal(size=(bb, 1, 64 * cfg.ch)) * 0.1, bf16)

    def timed(name, step, carry0, *ops):
        def run(n):
            f = jax.jit(
                lambda c0, *a: lax.scan(
                    lambda cc, _: (step(cc, *a), ()), c0, None, length=n
                )[0]
            )
            y = f(carry0, *ops)
            np.asarray(jnp.ravel(y)[:1])
            t0 = time.time()
            y = f(carry0, *ops)
            np.asarray(jnp.ravel(y)[:1])
            return time.time() - t0

        t1 = run(r)
        t2 = run(2 * r)
        ms = (t2 - t1) / r * 1000
        print(f"{name}: {ms:.1f} ms", file=sys.stderr, flush=True)
        return round(ms, 1)

    results = {}
    for merge in ("1", "0"):
        os.environ["LINR_HALO_MERGE"] = merge
        try:
            for first in (False, True):
                def pstep(x, occ_t, _first=first):
                    mask = (code >= 0).astype(bf16)[:, None, None, :]
                    geom = dict(
                        nbr27=nbr, mask=mask, code=code, dtype=bf16
                    )
                    lg = sb_chunk_logits(
                        params, cfg, geom, occ_t.astype(bf16),
                        jnp.int32(0), cs, x, _first,
                    )
                    return x + jnp.bfloat16(1e-30) * jnp.mean(
                        lg.astype(jnp.float32)
                    ).astype(bf16)

                results[f"probs_merge{merge}_first{int(first)}"] = timed(
                    f"probs_merge{merge}_first{int(first)}",
                    pstep, xg, occ,
                )
        finally:
            os.environ.pop("LINR_HALO_MERGE", None)

    print(json.dumps({"bricks": bb, "cs": cs, "ms": results}))


if __name__ == "__main__":
    main()
