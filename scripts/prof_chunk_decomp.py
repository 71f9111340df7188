"""Decompose the fused-chunk cost at production level-0 shapes (round-4
verdict next #1: single-chip training must reach <= 1.0 s/frame/epoch;
the measured model cost(cs) = H + cs*M has M ~ 85 ms/stage-row dominating
at cs=8, ~4x a naive speed-of-light estimate — find where it goes).

Probes (bb bricks, S = 1+cs stage rows, C=O=8, bf16, slot-major):
  halo_fwd    one b4_halo_sm exchange, output materialized (barrier)
  mm_pair     (Bb,S,512)->(Bb,S,1728)->(Bb,S,512) einsum pair (/2 = one
              production-shaped conv matmul + operand materialization)
  conv_fwd    b4_convsm forward (halo + matmul fused path)
  conv_vg     value_and_grad of sum(b4_convsm) (fwd + 1 dy-halo + dx
              matmul + dw moment)
  moment      the dw moment einsum "bsu,bsj->suj" alone
  chunk_fwd   sb_fused_chunk_bits forward (5 conv fwd + mlps)
  chunk_vg    the production unit (known ~812 ms at cs=8)

Timing: slope between scan(r) and scan(2r) inside one jit, op chained
through the carry (hoisting-proof), one host read per call (the axon
block_until_ready gotcha).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_chunk_decomp.py
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
    ap.add_argument("--probes", type=str, default="")
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
        B4_HALO_VOL,
        b4_convsm,
        b4_conv_weight_matrix_sm,
        b4_halo_sm,
    )

    bb, cs, r = args.bricks, args.cs, args.reps
    s = 1 + cs  # fused pass rows
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
                )[0],
                static_argnums=(),
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
    want = set(args.probes.split(",")) if args.probes else None

    def on(name):
        return want is None or name in want

    if on("halo_fwd"):
        def halo_step(x, nbr_):
            h = lax.optimization_barrier(b4_halo_sm(x, nbr_))
            return x + h[:, :, : B4_SLOTS * c]

        results["halo_fwd"] = timed("halo_fwd", halo_step, x0, nbr)

    if on("mm_pair"):
        w_up = jnp.asarray(
            rng.normal(size=(s, B4_SLOTS * c, B4_HALO_VOL * c)) * 0.05, bf16
        )
        w_dn = jnp.asarray(
            rng.normal(size=(s, B4_HALO_VOL * c, B4_SLOTS * o)) * 0.05, bf16
        )

        def mm_step(x, wu, wd):
            h = jnp.einsum(
                "bsk,skn->bsn", x, wu, preferred_element_type=bf16
            )
            return jnp.einsum(
                "bsn,snm->bsm", h, wd, preferred_element_type=bf16
            )

        results["mm_pair"] = timed("mm_pair", mm_step, x0, w_up, w_dn)

    if on("conv_fwd"):
        def conv_step(x, w_, nbr_):
            return b4_convsm(x, w_, nbr_)

        results["conv_fwd"] = timed("conv_fwd", conv_step, x0, w, nbr)

    if on("conv_vg"):
        # QUADRATIC loss: conv is linear in x, so grad of sum(conv) is a
        # constant that XLA hoists out of the scan (measured 2.8 ms —
        # nothing).  sum(conv^2) makes dy = 2*conv(x) carry-dependent.
        def conv_loss(x, w_, nbr_):
            y = b4_convsm(x, w_, nbr_).astype(jnp.float32)
            return jnp.sum(y * y)

        cvg = jax.value_and_grad(conv_loss)

        def convvg_step(x, w_, nbr_):
            _, g = cvg(x, w_, nbr_)
            return x + jnp.bfloat16(1e-3) * g.astype(bf16)

        results["conv_vg"] = timed("conv_vg", convvg_step, x0, w, nbr)

    if on("moment"):
        h0 = jnp.asarray(
            rng.normal(size=(bb, s, B4_HALO_VOL * o)) * 0.1, bf16
        )

        def moment_step(x, g_):
            m = jnp.einsum(
                "bsu,bsj->suj", x, g_, preferred_element_type=jnp.float32
            )
            return x + jnp.bfloat16(1e-6) * jnp.mean(m).astype(bf16)

        results["moment"] = timed("moment", moment_step, x0, h0)

    if on("chunk_fwd"):
        def cf_step(p, occ_t):
            mask = (code >= 0).astype(bf16)[:, None, None, :]
            geom = dict(nbr27=nbr, mask=mask, code=code, dtype=bf16)
            bits = sb_fused_chunk_bits(
                p, cfg, geom, occ_t, jnp.int32(0), cs, level_slices
            )
            return jax.tree_util.tree_map(lambda a: a + 1e-30 * bits, p)

        results["chunk_fwd"] = timed("chunk_fwd", cf_step, params, occ)

    if on("chunk_vg"):
        def cv_loss(p, occ_t):
            mask = (code >= 0).astype(bf16)[:, None, None, :]
            geom = dict(nbr27=nbr, mask=mask, code=code, dtype=bf16)
            f = jax.checkpoint(
                lambda pp: sb_fused_chunk_bits(
                    pp, cfg, geom, occ_t, jnp.int32(0), cs, level_slices
                ),
                policy=policy,
            )
            return jax.value_and_grad(f)(p)

        def cvg_step(p, occ_t):
            _, g = cv_loss(p, occ_t)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p, g)

        results["chunk_vg"] = timed("chunk_vg", cvg_step, params, occ)

    rec = {
        "what": "fused-chunk cost decomposition at production level-0 "
                "shapes (slope-timed scan pairs, on-chip)",
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
