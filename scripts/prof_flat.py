"""Microbench: candidate flat-activation conv formulations vs the current
(Bb, S, C, slots) layout (DESIGN.md roadmap item 1: remove the lane/sublane
tile pads and the matmul-side relayouts).

Slope method (see prof_b4.py): ops repeated inside one jitted lax.scan,
operands as jit args.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_flat.py
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
    ap.add_argument("--bricks", type=int, default=36864)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--grad", action="store_true")
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

    bb, s, r = args.bricks, args.stages, args.reps
    c = o = 8
    sc = s * c
    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)
    nbr = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr[rng.uniform(size=(bb, 27)) < 0.3] = -1
    nbr = jnp.asarray(nbr)
    w = jnp.asarray(rng.normal(size=(s, 27, c, o)), jnp.float32)
    b_ = jnp.zeros((s, o), jnp.float32)
    mask64 = jnp.asarray(rng.uniform(size=(bb, B4_SLOTS)) < 0.8, bf16)

    def timed(name, fn, x0, *a):
        def scan_n(n):
            f = jax.jit(
                lambda x0, *ops: lax.scan(
                    lambda cc, _: (fn(cc, *ops), ()), x0, None, length=n
                )[0]
            )
            y = f(x0, *a)
            np.asarray(jnp.ravel(y)[:1])
            t0 = time.time()
            y = f(x0, *a)
            np.asarray(jnp.ravel(y)[:1])
            return time.time() - t0

        t1 = scan_n(r)
        t2 = scan_n(2 * r)
        per = (t2 - t1) / r
        print(f"{name:36s} {per * 1e3:8.2f} ms/op", flush=True)
        return per

    # ---- A: current 4-D layout --------------------------------------
    x4 = jnp.asarray(rng.normal(size=(bb, s, c, B4_SLOTS)), bf16)
    geom = dict(nbr27=nbr, mask=mask64[:, None, None, :], code=None, dtype=bf16)

    def conv_a(x0):
        return b4conv3(x0, geom, w, b_)

    timed("A conv3 4-D (current) fwd", conv_a, x4)
    if args.grad:
        timed(
            "A conv3 4-D fwd+bwd",
            lambda x0: jax.grad(
                lambda xi: jnp.sum(b4conv3(xi, geom, w, b_).astype(jnp.float32))
            )(x0),
            x4,
        )

    # ---- B: flat (Bb, S, C*64) with batched einsum ------------------
    xf = jnp.asarray(rng.normal(size=(bb, s, c * B4_SLOTS)), bf16)
    w2 = b4_conv_weight_matrix(w).astype(bf16)  # (S, C*216, O*64)

    def conv_b(x0):
        xm = x0.reshape(bb, sc, B4_SLOTS)
        h = jax.lax.optimization_barrier(b4_halo(xm, nbr))
        ext = h.reshape(bb, s, c * B4_HALO_VOL)
        y = jnp.einsum("bsk,skn->bsn", ext, w2, preferred_element_type=bf16)
        y4 = (y.reshape(bb, s, o, B4_SLOTS) + b_.astype(bf16)[None, :, :, None])
        y4 = y4 * mask64[:, None, None, :]
        return y4.reshape(bb, s, o * B4_SLOTS)

    timed("B conv3 flat3D fwd", conv_b, xf)
    if args.grad:
        timed(
            "B conv3 flat3D fwd+bwd",
            lambda x0: jax.grad(
                lambda xi: jnp.sum(conv_b(xi).astype(jnp.float32))
            )(x0),
            xf,
        )

    # ---- C: 2-D flat (Bb, S*C*64), per-stage dots -------------------
    x2 = jnp.asarray(rng.normal(size=(bb, sc * B4_SLOTS)), bf16)
    w2s = [w2[i] for i in range(s)]

    def conv_c(x0, *ws):
        xm = x0.reshape(bb, sc, B4_SLOTS)
        h = jax.lax.optimization_barrier(b4_halo(xm, nbr))
        outs = []
        for i in range(s):
            ext = h[:, i * c: (i + 1) * c, :].reshape(bb, c * B4_HALO_VOL)
            y = jnp.dot(ext, ws[i], preferred_element_type=bf16)
            y4 = (
                y.reshape(bb, o, B4_SLOTS) + b_[i].astype(bf16)[None, :, None]
            ) * mask64[:, None, :]
            outs.append(y4.reshape(bb, o * B4_SLOTS))
        return jnp.concatenate(outs, axis=1)

    timed("C conv3 flat2D/per-stage fwd", conv_c, x2, *w2s)
    if args.grad:
        timed(
            "C conv3 flat2D fwd+bwd",
            lambda x0: jax.grad(
                lambda xi: jnp.sum(conv_c(xi, *w2s).astype(jnp.float32))
            )(x0),
            x2,
        )

    # ---- 1x1 conv formulations --------------------------------------
    w1 = jnp.asarray(rng.normal(size=(s, c, o)), jnp.float32)

    def c1_a(x0):  # current: 4-D einsum
        y = jnp.einsum("bscv,sco->bsov", x0, w1.astype(bf16),
                       preferred_element_type=bf16)
        return (y + b_.astype(bf16)[None, :, :, None]) * mask64[:, None, None, :]

    timed("1x1 A 4-D einsum", c1_a, x4)

    def c1_b(x0):  # flat input, 4-D view inside
        y = jnp.einsum(
            "bscv,sco->bsov", x0.reshape(bb, s, c, B4_SLOTS), w1.astype(bf16),
            preferred_element_type=bf16,
        )
        y = (y + b_.astype(bf16)[None, :, :, None]) * mask64[:, None, None, :]
        return y.reshape(bb, s, o * B4_SLOTS)

    timed("1x1 B flat-view einsum", c1_b, xf)

    # block-diagonal flat matmul
    eye = jnp.eye(B4_SLOTS, dtype=jnp.float32)
    wbd = jnp.einsum("sco,vu->scvou", w1, eye).reshape(
        s, c * B4_SLOTS, o * B4_SLOTS
    ).astype(bf16)

    def c1_c(x0, wb):
        y = jnp.einsum("bsk,skn->bsn", x0, wb, preferred_element_type=bf16)
        y4 = (y.reshape(bb, s, o, B4_SLOTS) + b_.astype(bf16)[None, :, :, None])
        return (y4 * mask64[:, None, None, :]).reshape(bb, s, o * B4_SLOTS)

    timed("1x1 C block-diag flat", c1_c, xf, wbd)


if __name__ == "__main__":
    main()
