"""Component microbenches for the superbrick training step (slope method:
each op repeated R times inside one jit via lax.scan to amortize the
~30 ms axon dispatch latency; cost = (t(2R) - t(R)) / R).

Usage: python scripts/prof_sb.py [--bricks 20480] [--sc 24]
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
    ap.add_argument("--bricks", type=int, default=20480)
    ap.add_argument("--sc", type=int, default=24, help="S*C merged channels")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from linr_pcgc_tpu.ops.superbricks import (
        SB_SLOTS,
        sb_halo,
        sb_yz_select,
        sb_conv_weight_matrix,
        SUB_OFFSETS,
        SUB_HALO,
    )

    bb, sc, r = args.bricks, args.sc, args.reps
    s, c = sc // 8, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bb, sc, SB_SLOTS)), jnp.bfloat16)
    # realistic neighbor map: mostly-present neighbors with gaps
    nbr = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr[rng.uniform(size=(bb, 27)) < 0.3] = -1
    nbr = jnp.asarray(nbr)
    w = jnp.asarray(rng.normal(size=(s, 27, c, c)), jnp.float32)

    def timed(name, fn, *a):
        # operands passed as jit ARGS (a closure would bake multi-GB
        # constants into the executable)
        def scan_n(n):
            def body(carry, _):
                out = fn(carry, *a)
                return out, ()

            f = jax.jit(
                lambda x0, *ops: lax.scan(
                    lambda cc, _: (fn(cc, *ops), ()), x0, None, length=n
                )[0]
            )
            y = f(x, *a)
            np.asarray(jnp.ravel(y)[:1])  # force host read (axon sync)
            t0 = time.time()
            y = f(x, *a)
            np.asarray(jnp.ravel(y)[:1])
            return time.time() - t0

        t1 = scan_n(r)
        t2 = scan_n(2 * r)
        per = (t2 - t1) / r
        print(f"{name:28s} {per * 1e3:8.2f} ms/op", flush=True)
        return per

    # halo exchange alone (result folded back to x shape to keep carry)
    def halo_fold(x0):
        h = sb_halo(x0, nbr)
        return x0 + h[:, :, 1: 1 + 8, :64].reshape(bb, sc, SB_SLOTS) * 1e-6

    timed("halo exchange", halo_fold)

    # extraction einsums alone (on a precomputed halo)
    h0 = sb_halo(x, nbr)

    def extract_only(x0, h0):
        acc = 0.0
        for (i, j, k) in SUB_OFFSETS:
            ext = sb_yz_select(h0[:, :, i: i + SUB_HALO, :], j, k)
            acc = acc + jnp.sum(ext, axis=(2, 3))
        return x0 + acc[:, :, None] * 1e-9

    timed("8x yz-select extraction", extract_only, h0)

    # conv matmuls alone
    w2 = sb_conv_weight_matrix(w).astype(jnp.bfloat16)
    ext0 = sb_yz_select(h0[:, :, 0:6, :], 0, 0).reshape(bb, s, c * 216)

    def matmuls_only(x0, ext0, w2):
        acc = 0.0
        for i in range(8):
            # vary the operand slightly so XLA cannot CSE the 8 matmuls
            y = jnp.einsum("bsk,skn->bsn", ext0 + jnp.bfloat16(i), w2,
                           preferred_element_type=jnp.bfloat16)
            acc = acc + jnp.sum(y, axis=(1, 2)) * 1e-9
        return x0 + acc[:, None, None].astype(x0.dtype)

    timed("8x conv matmul (C*216)", matmuls_only, ext0, w2)

    # full sbconv3 (halo + extract + matmul + assemble)
    from linr_pcgc_tpu.models.sb_network import sbconv3

    geom = dict(
        nbr27=nbr,
        mask=jnp.ones((bb, 1, 1, SB_SLOTS), jnp.bfloat16),
        code=jnp.zeros((bb, SB_SLOTS), jnp.int32),
        dtype=jnp.bfloat16,
    )
    b_ = jnp.zeros((s, c), jnp.float32)

    def conv_full(x0):
        y = sbconv3(x0.reshape(bb, s, c, SB_SLOTS), geom, w, b_)
        return y.reshape(bb, sc, SB_SLOTS)

    timed("sbconv3 fwd", conv_full)

    # output assembly alone: stack + 9-D transpose + reshape
    ys0 = jnp.asarray(rng.normal(size=(8, bb, s, c * 64)), jnp.bfloat16)

    def assemble_only(x0, ys0):
        y = (ys0 + x0[0, 0, 0].astype(jnp.bfloat16)).reshape(
            2, 2, 2, bb, s, c, 4, 4, 4
        )
        y = jnp.transpose(y, (3, 4, 5, 0, 6, 1, 7, 2, 8)).reshape(
            bb, s, c, SB_SLOTS
        )
        return x0 + y.reshape(bb, sc, SB_SLOTS) * 1e-9

    timed("output assembly (9D T)", assemble_only, ys0)

    # conv without the final assembly (sum the 8 sub-brick outputs)
    def conv_noassemble(x0):
        xm = x0
        h = sb_halo(xm, nbr)
        w2 = sb_conv_weight_matrix(w).astype(jnp.bfloat16)
        acc = 0.0
        for (i, j, k) in SUB_OFFSETS:
            ext = sb_yz_select(h[:, :, i: i + SUB_HALO, :], j, k).reshape(
                bb, s, c * 216
            )
            y = jnp.einsum("bsk,skn->bsn", ext, w2,
                           preferred_element_type=jnp.bfloat16)
            acc = acc + jnp.sum(y, axis=(1, 2)) * 1e-9
        return x0 + acc[:, None, None].astype(x0.dtype)

    timed("sbconv3 minus assembly", conv_noassemble)

    # extract + matmul chained, from a fixed halo arg
    def extmm(x0, h0, w2):
        acc = 0.0
        for (i, j, k) in SUB_OFFSETS:
            ext = sb_yz_select(h0[:, :, i: i + SUB_HALO, :], j, k).reshape(
                bb, s, c * 216
            )
            y = jnp.einsum("bsk,skn->bsn", ext, w2,
                           preferred_element_type=jnp.bfloat16)
            acc = acc + jnp.sum(y, axis=(1, 2)) * 1e-9
        return x0 + acc[:, None, None].astype(x0.dtype)

    timed("8x extract+matmul (h arg)", extmm, h0, w2)

    # halo + extraction only (no matmul)
    def halo_ext(x0):
        h = sb_halo(x0, nbr)
        acc = 0.0
        for (i, j, k) in SUB_OFFSETS:
            ext = sb_yz_select(h[:, :, i: i + SUB_HALO, :], j, k)
            acc = acc + jnp.sum(ext, axis=(2, 3))
        return x0 + acc[:, :, None] * 1e-9

    timed("halo+8x extract", halo_ext)

    # single extract+matmul in-graph
    def extmm1(x0, h0, w2):
        ext = sb_yz_select(h0[:, :, 0:6, :], 0, 0).reshape(bb, s, c * 216)
        y = jnp.einsum("bsk,skn->bsn", ext, w2,
                       preferred_element_type=jnp.bfloat16)
        return x0 + jnp.sum(y, axis=(1, 2))[:, None, None].astype(x0.dtype) * 1e-9

    timed("1x extract+matmul (h arg)", extmm1, h0, w2)

    # ---- carry-DEPENDENT extraction variants (loop hoisting defeated) ----
    import numpy as _np
    from linr_pcgc_tpu.ops.superbricks import _yz_select_matrix, _yz_group_slot

    # barrier-halo then 8 extracts (sbconv3's exact pattern minus matmuls)
    def bhalo_ext(x0):
        h = jax.lax.optimization_barrier(sb_halo(x0, nbr))
        acc = 0.0
        for (i, j, k) in SUB_OFFSETS:
            ext = sb_yz_select(h[:, :, i: i + SUB_HALO, :], j, k)
            acc = acc + jnp.sum(ext, axis=(2, 3))
        return x0 + acc[:, :, None] * 1e-9

    timed("barrier-halo + 8x extract", bhalo_ext)

    # extraction via static minor-axis take of the flat (Bb, SC, 1000) halo
    take_idx = _np.zeros((8, 216), _np.int32)
    for p, (i, j, k) in enumerate(SUB_OFFSETS):
        for wx in range(6):
            for wy in range(6):
                for wz in range(6):
                    take_idx[p, wx * 36 + wy * 6 + wz] = (
                        (i + wx) * 100 + _yz_group_slot(j + wy, k + wz)
                    )
    take_idx_j = jnp.asarray(take_idx)

    def ext_take(x0):
        h = jax.lax.optimization_barrier(sb_halo(x0, nbr)).reshape(bb, sc, 1000)
        ext = jnp.take(h, take_idx_j.reshape(-1), axis=2)
        return x0 + jnp.sum(
            ext.reshape(bb, sc, 8, 216), axis=(2, 3)
        )[:, :, None] * 1e-9

    timed("halo + take-extract", ext_take)

    # extraction as (bb, sc*6, 100) @ (100, 36) plain dots
    def ext_dot(x0):
        h = jax.lax.optimization_barrier(sb_halo(x0, nbr))
        acc = 0.0
        for (i, j, k) in SUB_OFFSETS:
            hx = h[:, :, i: i + SUB_HALO, :].reshape(bb, sc * SUB_HALO, 100)
            sel = _YZ_SELECT_CONST[(j, k)]
            ext = jax.lax.dot_general(
                hx, sel, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            acc = acc + jnp.sum(ext, axis=(1, 2))
        return x0 + acc[:, None, None].astype(x0.dtype) * 1e-9

    from linr_pcgc_tpu.ops.superbricks import _YZ_SELECT as _SEL_F32
    _YZ_SELECT_CONST = {
        kk: v.astype(jnp.bfloat16) for kk, v in _SEL_F32.items()
    }
    timed("halo + dot-extract", ext_dot)

    # fwd+bwd of one conv
    def conv_grad(x0):
        g = jax.grad(
            lambda xi: jnp.sum(
                sbconv3(xi.reshape(bb, s, c, SB_SLOTS), geom, w, b_).astype(
                    jnp.float32
                )
            )
        )(x0)
        return x0 + g * 1e-9

    timed("sbconv3 fwd+bwd", conv_grad)


if __name__ == "__main__":
    main()
