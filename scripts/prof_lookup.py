"""Compare jnp.searchsorted methods for the codec's sorted-key lookups
(ops.coords.lookup): the nbr27 brick-neighbor map queries 27 x cap keys
against cap sorted keys per level — with method="sort" that is a
(28*cap)-row bitonic sort per level, the same cost class as the voxel
sort the gp-brickify just eliminated.  method="scan_unrolled" is
log2(cap) unrolled gather passes over the query array instead.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_lookup.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=81920)
    ap.add_argument("--mult", type=int, default=27)
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

    n, m, r = args.keys, args.mult, args.reps
    rng = np.random.default_rng(0)
    keys = np.sort(
        rng.choice(np.int64(1) << 40, size=n, replace=False)
    ).astype(np.int64)
    q = rng.choice(keys, size=n * m).astype(np.int64) + rng.integers(
        -2, 3, size=n * m
    )
    keys_d = jnp.asarray(keys)
    q_d = jnp.asarray(q)

    def timed(name, step, carry0, *ops):
        def run(k):
            f = jax.jit(
                lambda c0, *a: lax.scan(
                    lambda cc, _: (step(cc, *a), ()), c0, None, length=k
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
        print(f"{name}: {ms:.2f} ms", file=sys.stderr, flush=True)
        return round(ms, 2)

    results = {}
    for method in ("sort", "scan_unrolled", "scan", "compare_all"):
        if method == "compare_all" and n > 4096:
            continue  # O(n*q) — would OOM/time out at production sizes

        def lstep(qc, ks, _m=method):
            pos = jnp.searchsorted(ks, qc, method=_m).astype(jnp.int32)
            return qc + pos.astype(jnp.int64) * 0 + jnp.int64(1) * (
                pos[0] % 2
            )

        try:
            results[method] = timed(f"lookup_{method}", lstep, q_d, keys_d)
        except Exception as e:
            results[method] = f"error: {e}"
            print(f"{method} failed: {e}", file=sys.stderr)

    print(json.dumps({"keys": n, "queries": n * m, "ms": results}))


if __name__ == "__main__":
    main()
