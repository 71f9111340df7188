"""Decompose the halo->matmul composition gap (measured: halo ~5.5ms* +
matmul 2.4ms but composed 22.4ms at 36864 bricks, SC=32; *the halo-only
probe under-counts because slicing its output DCEs unused fragments).

Probes:
  1. halo-full: halo with EVERY column consumed (reduction) — true cost
  2. halo+reshape: materialize (Bb,S,C*216) from (Bb,SC,216) — relayout
  3. halo+chan-mm: matmul consuming (Bb,SC,216) directly, no reshape
  4. halo+real-mm: the production composition (baseline)
  5. slot-major prototype: halo assembled channel-MINOR so the concat IS
     the (Bb,S,216*C) matmul operand; weight permutation folded at trace
     time.  fwd only (no custom VJP yet).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_flat2.py
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from linr_pcgc_tpu.ops.superbricks import (
        B4_SLOTS,
        B4_HALO_VOL,
        B4_PLANE,
        B4_HALO,
        _B4_X_SRC,
        _DIRS,
        _YZ_ORDER,
        _gather_rows,
        b4_halo,
        b4_conv_weight_matrix,
    )

    bb, s, r = args.bricks, args.stages, args.reps
    c = o = 8
    sc = s * c
    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)
    nbr_np = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr_np[rng.uniform(size=(bb, 27)) < 0.3] = -1
    nbr = jnp.asarray(nbr_np)
    w = jnp.asarray(rng.normal(size=(s, 27, c, o)), jnp.float32)
    x3 = jnp.asarray(rng.normal(size=(bb, sc, B4_SLOTS)), bf16)

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
        print(f"{name:34s} {per * 1e3:8.2f} ms/op", flush=True)
        return per

    # 1. full consumption
    def halo_full(x0):
        h = b4_halo(x0, nbr)
        red = jnp.sum(h, axis=2) * 1e-6  # (bb, sc) reads every column
        return x0 + red[:, :, None].astype(bf16)

    timed("1 halo full-consume", halo_full, x3)

    # 2. halo + materialized reshape to the matmul operand layout
    def halo_reshape(x0):
        h = jax.lax.optimization_barrier(b4_halo(x0, nbr))
        e = jax.lax.optimization_barrier(h.reshape(bb, s, c * B4_HALO_VOL))
        red = jnp.sum(e, axis=2) * 1e-6  # (bb, s)
        return x0 + jnp.repeat(red, c, axis=1)[:, :, None].astype(bf16)

    timed("2 halo + reshape materialize", halo_reshape, x3)

    w2 = b4_conv_weight_matrix(w).astype(bf16)  # (S, C*216, O*64)
    wch = jnp.asarray(rng.normal(size=(B4_HALO_VOL, B4_SLOTS)), bf16)

    def halo_chan_mm(x0, wc):
        h = jax.lax.optimization_barrier(b4_halo(x0, nbr))
        y = jnp.einsum("bch,hn->bcn", h, wc, preferred_element_type=bf16)
        return x0 + y * 1e-6

    def halo_real_mm(x0, w2_):
        h = jax.lax.optimization_barrier(b4_halo(x0, nbr))
        ext = h.reshape(bb, s, c * B4_HALO_VOL)
        y = jnp.einsum("bsk,skn->bsn", ext, w2_, preferred_element_type=bf16)
        return x0 + y.reshape(bb, sc, B4_SLOTS) * 1e-6

    timed("3 halo + chan-mm (no reshape)", halo_chan_mm, x3, wch)
    timed("4 halo + real mm (baseline)", halo_real_mm, x3, w2)

    # 5. slot-major prototype -----------------------------------------
    xsm = jnp.asarray(rng.normal(size=(bb, s, B4_SLOTS * c)), bf16)

    def b4_halo_slotmajor(x0):
        """x (Bb, S, 64*C) slot-major -> (Bb, S, 216*C) halo, channel
        minor: assembly concat directly yields the matmul operand."""
        xv = x0.reshape(bb, s, 4, 16, c)  # (x-plane, yz, c)

        frags = {}
        for d in _DIRS:
            dx, dy, dz = d
            sx = _B4_X_SRC[dx]
            slab = xv[:, :, sx[0]: sx[1]]          # (bb, s, px, 16, c)
            # yz-column selection on axis -2 (the 16-axis)
            if (dy, dz) == (0, 0):
                pc = slab
            elif (dy, dz) == (-1, 0):
                pc = slab[..., 12:16, :]
            elif (dy, dz) == (1, 0):
                pc = slab[..., 0:4, :]
            elif (dy, dz) == (0, -1):
                pc = slab[..., 3::4, :]
            elif (dy, dz) == (0, 1):
                pc = slab[..., 0::4, :]
            elif (dy, dz) == (-1, -1):
                pc = slab[..., 15:16, :]
            elif (dy, dz) == (-1, 1):
                pc = slab[..., 12:13, :]
            elif (dy, dz) == (1, -1):
                pc = slab[..., 3:4, :]
            else:
                pc = slab[..., 0:1, :]
            px, wd = pc.shape[2], pc.shape[3]
            if d == (0, 0, 0):
                frags[d] = pc.reshape(bb, s, px, wd * c)
            else:
                flat = pc.reshape(bb, s * px * wd * c)
                g = _gather_rows(flat, nbr[:, _DIRS.index(d)])
                frags[d] = g.reshape(bb, s, px, wd * c)

        planes = []
        for hp in range(B4_HALO):
            dx = -1 if hp == 0 else (1 if hp == B4_HALO - 1 else 0)
            sp = 0 if dx != 0 else hp - 1
            planes.append(
                jnp.concatenate(
                    [frags[(dx, dy, dz)][:, :, sp, :] for (dy, dz) in _YZ_ORDER],
                    axis=2,
                )
            )
        return jnp.concatenate(planes, axis=2)  # (Bb, S, 216*C)

    # weight in slot-major order: rows f*C+c, cols v*O+o
    w2sm = (
        b4_conv_weight_matrix(w)
        .reshape(s, c, B4_HALO_VOL, o, B4_SLOTS)
        .transpose(0, 2, 1, 4, 3)
        .reshape(s, B4_HALO_VOL * c, B4_SLOTS * o)
        .astype(bf16)
    )

    def slotmajor_conv(x0, w2_):
        h = jax.lax.optimization_barrier(b4_halo_slotmajor(x0))
        y = jnp.einsum("bsk,skn->bsn", h, w2_, preferred_element_type=bf16)
        return x0 + y * 1e-6

    timed("5 slot-major halo+mm fwd", slotmajor_conv, xsm, w2sm)

    def slotmajor_halo_only(x0):
        h = b4_halo_slotmajor(x0)
        red = jnp.sum(h, axis=2) * 1e-6
        return x0 + red[:, :, None].astype(bf16)

    timed("5b slot-major halo full-consume", slotmajor_halo_only, xsm)

    # correctness cross-check vs canonical conv at f32 (small)
    from linr_pcgc_tpu.models.sb_network import b4conv3

    bbs = 512
    xs = rng.normal(size=(bbs, s, c, B4_SLOTS)).astype(np.float32)
    nbr_s = rng.integers(-1, bbs, size=(bbs, 27)).astype(np.int32)
    geom = dict(
        nbr27=jnp.asarray(nbr_s),
        mask=jnp.ones((bbs, 1, 1, B4_SLOTS), jnp.float32),
        code=None,
        dtype=jnp.float32,
    )
    y_ref = np.asarray(
        b4conv3(jnp.asarray(xs), geom, w, jnp.zeros((s, o), jnp.float32))
    )  # (bbs, s, o, 64)

    # build slot-major input from xs: (bbs, s, 64*c), slot-major
    xs_sm = jnp.asarray(
        xs.transpose(0, 1, 3, 2).reshape(bbs, s, B4_SLOTS * c), jnp.float32
    )
    w2sm_f = (
        b4_conv_weight_matrix(w)
        .reshape(s, c, B4_HALO_VOL, o, B4_SLOTS)
        .transpose(0, 2, 1, 4, 3)
        .reshape(s, B4_HALO_VOL * c, B4_SLOTS * o)
    )

    # re-bind module-level names used inside b4_halo_slotmajor
    def halo_sm_generic(x0, nbr_, bb_, s_):
        xv = x0.reshape(bb_, s_, 4, 16, c)
        frags = {}
        for d in _DIRS:
            dx, dy, dz = d
            sx = _B4_X_SRC[dx]
            slab = xv[:, :, sx[0]: sx[1]]
            if (dy, dz) == (0, 0):
                pc = slab
            elif (dy, dz) == (-1, 0):
                pc = slab[..., 12:16, :]
            elif (dy, dz) == (1, 0):
                pc = slab[..., 0:4, :]
            elif (dy, dz) == (0, -1):
                pc = slab[..., 3::4, :]
            elif (dy, dz) == (0, 1):
                pc = slab[..., 0::4, :]
            elif (dy, dz) == (-1, -1):
                pc = slab[..., 15:16, :]
            elif (dy, dz) == (-1, 1):
                pc = slab[..., 12:13, :]
            elif (dy, dz) == (1, -1):
                pc = slab[..., 3:4, :]
            else:
                pc = slab[..., 0:1, :]
            px, wd = pc.shape[2], pc.shape[3]
            if d == (0, 0, 0):
                frags[d] = pc.reshape(bb_, s_, px, wd * c)
            else:
                flat = pc.reshape(bb_, s_ * px * wd * c)
                g = _gather_rows(flat, nbr_[:, _DIRS.index(d)])
                frags[d] = g.reshape(bb_, s_, px, wd * c)
        planes = []
        for hp in range(B4_HALO):
            dx = -1 if hp == 0 else (1 if hp == B4_HALO - 1 else 0)
            sp = 0 if dx != 0 else hp - 1
            planes.append(
                jnp.concatenate(
                    [frags[(dx, dy, dz)][:, :, sp, :] for (dy, dz) in _YZ_ORDER],
                    axis=2,
                )
            )
        return jnp.concatenate(planes, axis=2)

    h_sm = halo_sm_generic(xs_sm, jnp.asarray(nbr_s), bbs, s)
    y_sm = jnp.einsum(
        "bsk,skn->bsn", h_sm, w2sm_f,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    y_sm4 = np.asarray(y_sm).reshape(bbs, s, B4_SLOTS, o).transpose(0, 1, 3, 2)
    err = np.abs(y_sm4 - y_ref).max()
    print(f"slot-major vs canonical max err: {err:.2e}")
    assert err < 1e-4, err


if __name__ == "__main__":
    main()
