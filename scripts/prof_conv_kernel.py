"""Time b4_convsm fwd and value_and_grad under LINR_CONV_KERNEL=xla vs
pallas at production level-0 shapes (g0: 81920 bricks, stage chunk 4,
C=O=8, bf16) — the decision measurement for making the plane-blocked
Mosaic kernels (ops/pallas_conv.py) the default.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_conv_kernel.py
"""

import argparse
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
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--cin", type=int, default=8)
    ap.add_argument("--cout", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from linr_pcgc_tpu.ops import superbricks as sbops

    bb, s, c, o, r = args.bricks, args.stages, args.cin, args.cout, args.reps
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    nbr_np = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr_np[rng.uniform(size=(bb, 27)) < 0.3] = -1
    nbr = jnp.asarray(nbr_np)
    w = jnp.asarray(rng.normal(size=(s, 27, c, o)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.normal(size=(bb, s, 64 * c)), dt)
    print(f"devices: {jax.devices()}", flush=True)
    print(f"bb={bb} s={s} c={c} o={o} dtype={args.dtype} reps={r}", flush=True)

    def slope(f, *a):
        def scan_n(n):
            g = jax.jit(
                lambda x0, *ops: lax.scan(
                    lambda cc, _: (f(cc, *ops), ()), x0, None, length=n
                )[0]
            )
            y = g(*a)
            np.asarray(jnp.ravel(y)[:1])
            t0 = time.time()
            y = g(*a)
            np.asarray(jnp.ravel(y)[:1])
            return time.time() - t0

        t1, t2 = scan_n(r), scan_n(2 * r)
        return (t2 - t1) / r

    def slope_vg(f, *a):
        # value_and_grad chained through the carry (dx feeds the next rep)
        def body(cc, _):
            val, (gx, gw) = jax.value_and_grad(
                lambda xx, ww: jnp.sum(f(xx, ww).astype(jnp.float32)),
                argnums=(0, 1),
            )(cc, w)
            return gx.astype(cc.dtype), ()

        def scan_n(n):
            g = jax.jit(
                lambda x0: lax.scan(body, x0, None, length=n)[0]
            )
            y = g(x)
            np.asarray(jnp.ravel(y)[:1])
            t0 = time.time()
            y = g(x)
            np.asarray(jnp.ravel(y)[:1])
            return time.time() - t0

        t1, t2 = scan_n(r), scan_n(2 * r)
        return (t2 - t1) / r

    results = {}
    for mode in ("xla", "pallas"):
        os.environ["LINR_CONV_KERNEL"] = mode

        def conv(xx, ww):
            return sbops.b4_convsm(xx, ww, nbr)

        t_fwd = slope(lambda cc, ww: conv(cc, ww), x, w)
        print(f"{mode:8s} fwd          {t_fwd*1e3:8.2f} ms", flush=True)
        t_vg = slope_vg(conv)
        print(f"{mode:8s} fwd+bwd      {t_vg*1e3:8.2f} ms", flush=True)
        results[mode] = (t_fwd, t_vg)

    fx, vx = results["xla"]
    fp, vp = results["pallas"]
    print(f"speedup fwd {fx/fp:.2f}x  vjp {vx/vp:.2f}x", flush=True)


if __name__ == "__main__":
    main()
