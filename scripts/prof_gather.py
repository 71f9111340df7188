"""Characterize the XLA row-gather cost model on the TPU: time
take(x, idx) for fixed rows (Bb) and varying row width, plus the halo at
S=1 vs S=9 — separates per-row cost from byte throughput (round-5: is
the halo row-rate- or bandwidth-bound?).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_gather.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=81920)
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
    from linr_pcgc_tpu.ops.superbricks import (
        B4_SLOTS,
        _b4_halo_sm_forward,
    )

    bb, r = args.rows, args.reps
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, bb, size=(bb,)).astype(np.int32)
    idx = jnp.asarray(idx_np)

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
        print(f"{name}: {ms:.2f} ms", file=sys.stderr, flush=True)
        return round(ms, 2)

    results = {}
    for k in (128, 512, 1152, 2304, 4608, 9216):
        x0 = jnp.asarray(rng.normal(size=(bb, k)), jnp.bfloat16)

        def gstep(x, ix):
            g = jnp.take(x, ix, axis=0)
            return x + g * jnp.bfloat16(1e-3)

        ms = timed(f"take_rows_{k}el", gstep, x0, idx)
        gb = bb * k * 2 / 1e9
        results[f"take_{k}"] = {
            "ms": ms,
            "GB": round(gb, 3),
            "GBps": round(gb / (ms / 1000), 1),
            "Mrows_s": round(bb / (ms / 1000) / 1e6, 1),
        }

    c = 8
    nbr_np = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr_np[rng.uniform(size=(bb, 27)) < 0.25] = -1
    nbr = jnp.asarray(nbr_np)
    for s in (1, 2, 9):
        x0 = jnp.asarray(
            rng.normal(size=(bb, s, B4_SLOTS * c)), jnp.bfloat16
        )

        def hstep(x, nbr_):
            h = lax.optimization_barrier(_b4_halo_sm_forward(x, nbr_))
            return x + h[:, :, : B4_SLOTS * c]

        results[f"halo26_S{s}"] = timed(f"halo26_S{s}", hstep, x0, nbr)

    print(json.dumps({"rows": bb, "results": results}))


if __name__ == "__main__":
    main()
