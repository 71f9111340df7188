"""Dissect the halo gather cost: contiguous-operand gathers vs strided
slice+gather, barrier vs fused, and the frag-src build alone — decides
where the remaining ~60 ms per exchange actually goes (round 5).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_halo_variants.py
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
    ap.add_argument("--stages", type=int, default=9)
    ap.add_argument("--reps", type=int, default=6)
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
        _DIRS,
        _B4_X_SRC,
        _YZ_SHIP,
        _b4_yz_cols_sm,
        _gather_rows,
        _b4_halo_sm3_forward,
        b4_convsm,
        b4_conv_weight_matrix_sm3,
    )

    bb, s, r = args.bricks, args.stages, args.reps
    c = o = 8
    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)
    nbr_np = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr_np[rng.uniform(size=(bb, 27)) < 0.25] = -1
    nbr = jnp.asarray(nbr_np)
    x0 = jnp.asarray(rng.normal(size=(bb, s, B4_SLOTS * c)), bf16)
    w = jnp.asarray(rng.normal(size=(s, 27, c, o)) * 0.1, jnp.float32)

    dirs_nc = [d for d in _DIRS if d != (0, 0, 0)]
    widths = []
    for d in dirs_nc:
        dx, dy, dz = d
        px = _B4_X_SRC[dx][1] - _B4_X_SRC[dx][0]
        widths.append(px * len(_YZ_SHIP[(dy, dz)]))
    offs = np.concatenate([[0], np.cumsum(widths)]).astype(np.int64)

    def build_frag_src(x):
        """All 26 outgoing fragments, direction-major contiguous:
        (Bb, S, 152*C)."""
        xv = x.reshape(bb, s, 4, 16, c)
        pieces = []
        for d in dirs_nc:
            dx, dy, dz = d
            sx = _B4_X_SRC[dx]
            pc = _b4_yz_cols_sm(xv[:, :, sx[0]: sx[1]], dy, dz)
            px, wd = pc.shape[2], pc.shape[3]
            pieces.append(pc.reshape(bb, s, px * wd * c))
        return jnp.concatenate(pieces, axis=2)

    def gathers_from_src(src, nbr_):
        pieces = []
        for k, d in enumerate(dirs_nc):
            seg = src[:, :, offs[k] * c: offs[k + 1] * c].reshape(bb, -1)
            pieces.append(
                _gather_rows(seg, nbr_[:, _DIRS.index(d)]).reshape(
                    bb, s, widths[k] * c
                )
            )
        return jnp.concatenate(pieces, axis=2)

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

    # A: frag-src build alone (strided slices -> contiguous write)
    def a_step(x):
        src = lax.optimization_barrier(build_frag_src(x))
        return x + src[:, :, : B4_SLOTS * c]

    results["frag_build"] = timed("frag_build", a_step, x0)

    # B: gathers from a PRE-BUILT contiguous frag src (src fixed operand)
    src0 = jax.jit(build_frag_src)(x0)

    def b_step(x, src, nbr_):
        g = lax.optimization_barrier(gathers_from_src(src, nbr_))
        return x + g[:, :, : B4_SLOTS * c]

    results["gathers_contig"] = timed("gathers_contig", b_step, x0, src0, nbr)

    # C: build + gathers composed (= a full exchange via frag-src)
    def c_step(x, nbr_):
        src = build_frag_src(x)
        g = lax.optimization_barrier(gathers_from_src(src, nbr_))
        return x + g[:, :, : B4_SLOTS * c]

    results["build_plus_gathers"] = timed(
        "build_plus_gathers", c_step, x0, nbr
    )

    # D: production sm3 conv fwd with and without the halo barrier
    def conv_step(x, w_, nbr_):
        return b4_convsm(x, w_, nbr_)

    for barrier in ("1", "0"):
        os.environ["LINR_HALO"] = "sm3"
        os.environ["LINR_HALO_BARRIER"] = barrier
        try:
            results[f"conv_fwd_sm3_bar{barrier}"] = timed(
                f"conv_fwd_sm3_bar{barrier}", conv_step, x0, w, nbr
            )
        finally:
            os.environ.pop("LINR_HALO", None)
            os.environ.pop("LINR_HALO_BARRIER", None)

    print(json.dumps({"bricks": bb, "stages": s, "ms": results}))


if __name__ == "__main__":
    main()
