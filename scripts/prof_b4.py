"""Component microbenches for the 4^3 brick conv (slope method; operands
as jit args so nothing is loop-hoisted or baked as constants)."""

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
    ap.add_argument("--bricks", type=int, default=65536)
    ap.add_argument("--sc", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from linr_pcgc_tpu.ops.superbricks import (
        B4_SLOTS,
        B4_HALO_VOL,
        b4_halo,
        b4_conv_weight_matrix,
    )
    from linr_pcgc_tpu.models.sb_network import b4conv3

    bb, sc, r = args.bricks, args.sc, args.reps
    s, c = sc // 8, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bb, sc, B4_SLOTS)), jnp.bfloat16)
    nbr = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr[rng.uniform(size=(bb, 27)) < 0.3] = -1
    nbr = jnp.asarray(nbr)
    w = jnp.asarray(rng.normal(size=(s, 27, c, c)), jnp.float32)

    def timed(name, fn, *a):
        def scan_n(n):
            f = jax.jit(
                lambda x0, *ops: lax.scan(
                    lambda cc, _: (fn(cc, *ops), ()), x0, None, length=n
                )[0]
            )
            y = f(x, *a)
            np.asarray(jnp.ravel(y)[:1])
            t0 = time.time()
            y = f(x, *a)
            np.asarray(jnp.ravel(y)[:1])
            return time.time() - t0

        t1 = scan_n(r)
        t2 = scan_n(2 * r)
        per = (t2 - t1) / r
        print(f"{name:28s} {per * 1e3:8.2f} ms/op", flush=True)
        return per

    def halo_fold(x0):
        h = b4_halo(x0, nbr)
        return x0 + h[:, :, 36: 36 + 64] * 1e-6

    timed("b4 halo", halo_fold)

    w2c = b4_conv_weight_matrix(w).astype(jnp.bfloat16)

    def halo_mm(x0, w2):
        h = jax.lax.optimization_barrier(b4_halo(x0, nbr))
        ext = h.reshape(bb, s, c * B4_HALO_VOL)
        y = jnp.einsum("bsk,skn->bsn", ext, w2,
                       preferred_element_type=jnp.bfloat16)
        return x0 + y.reshape(bb, sc, B4_SLOTS) * 1e-6

    timed("b4 halo+matmul (barrier)", halo_mm, w2c)

    def halo_mm_nobar(x0, w2):
        h = b4_halo(x0, nbr)
        ext = h.reshape(bb, s, c * B4_HALO_VOL)
        y = jnp.einsum("bsk,skn->bsn", ext, w2,
                       preferred_element_type=jnp.bfloat16)
        return x0 + y.reshape(bb, sc, B4_SLOTS) * 1e-6

    timed("b4 halo+matmul (no bar)", halo_mm_nobar, w2c)

    geom = dict(
        nbr27=nbr,
        mask=jnp.ones((bb, 1, 1, B4_SLOTS), jnp.bfloat16),
        code=jnp.zeros((bb, B4_SLOTS), jnp.int32),
        dtype=jnp.bfloat16,
    )
    b_ = jnp.zeros((s, c), jnp.float32)

    def conv_full(x0):
        y = b4conv3(x0.reshape(bb, s, c, B4_SLOTS), geom, w, b_)
        return y.reshape(bb, sc, B4_SLOTS)

    timed("b4conv3 fwd", conv_full)

    def conv_grad(x0):
        g = jax.grad(
            lambda xi: jnp.sum(
                b4conv3(xi.reshape(bb, s, c, B4_SLOTS), geom, w, b_).astype(
                    jnp.float32
                )
            )
        )(x0)
        return x0 + g * 1e-9

    timed("b4conv3 fwd+bwd", conv_grad)

    # matmul alone at the same shapes
    ext0 = jnp.asarray(
        rng.normal(size=(bb, s, c * B4_HALO_VOL)), jnp.bfloat16
    )

    def mm_only(x0, ext0, w2):
        y = jnp.einsum("bsk,skn->bsn", ext0 + x0[0, 0, 0].astype(jnp.bfloat16),
                       w2, preferred_element_type=jnp.bfloat16)
        return x0 + y.reshape(bb, sc, B4_SLOTS) * 1e-6

    timed("b4 matmul only", mm_only, ext0, w2c)


if __name__ == "__main__":
    main()
