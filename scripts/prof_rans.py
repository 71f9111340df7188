"""Split the decode stage-round cost into its three dispatches at
production level-0 shapes: the probability pass (_fused_probs at the
production cs), the device rANS decode scan, and the occupancy scatter.

The rANS kernels are lane-parallel lax.scans with N/LANES sequential
steps — at level-0 production shapes (tv ~ 3.2M symbols per 4-frame
chunk) that is ~25k scan steps per stage, a serial chain whose cost is
invisible in the e2e PROF phases (it hides inside the one per-level
sync).  This measurement decides where the decode optimization budget
goes: wider lanes (fewer scan steps) vs cheaper probability passes
(smaller cs).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_rans.py
"""

import argparse
import json
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
    ap.add_argument("--bricks", type=int, default=327680,
                    help="level-0 brick count of a 4-frame 800k-pt chunk")
    ap.add_argument("--tv", type=int, default=3200000,
                    help="compacted voxel count of the chunk")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from linr_pcgc_tpu.data.dataset import bucket_size
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.ops.rans import (
        LANES,
        RANS_L,
        rans_decode_segment,
        rans_encode_segment,
        rans_initial_states,
    )
    from linr_pcgc_tpu.ops.superbricks import B4_SLOTS
    from linr_pcgc_tpu.runtime.dev_codec import CDT, _fused_probs, _fused_cs

    print(f"devices: {jax.devices()}", flush=True)
    bb = args.bricks
    tv = bucket_size(args.tv)
    cfg = ModelConfig(scale_num=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def timed(label, fn, *a, reps=args.reps):
        y = fn(*a)
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[:1])  # compile
        t0 = time.time()
        for _ in range(reps):
            y = fn(*a)
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[:1])
        dt = (time.time() - t0) / reps
        print(f"{label:32s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    results = {"bb": bb, "tv": tv, "lanes": LANES}

    # ---- rANS decode scan at level-0 segment size (one stage) ----
    probs = jnp.asarray(rng.uniform(0.05, 0.95, tv), jnp.float32)
    valid = jnp.ones((tv,), bool)
    stream = jnp.asarray(rng.integers(0, 256, 4 * tv, dtype=np.uint8))
    st0 = rans_initial_states()
    cur0 = jnp.zeros((LANES,), jnp.int32)

    @jax.jit
    def dec_seg(st, cur):
        return rans_decode_segment(st, cur, stream, probs, valid)

    results["rans_dec_seg_s"] = timed("rans_decode_segment", dec_seg, st0, cur0)

    bits = jnp.asarray(rng.integers(0, 2, tv, dtype=np.uint8))

    @jax.jit
    def enc_seg(st):
        return rans_encode_segment(st, probs, bits, valid)

    results["rans_enc_seg_s"] = timed("rans_encode_segment", enc_seg, st0)

    # ---- probability passes at level-0 brick shapes ----
    code = jnp.asarray(
        rng.integers(0, 128, (bb, B4_SLOTS), dtype=np.int64), jnp.int32
    )
    nbr_np = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr_np[rng.uniform(size=(bb, 27)) < 0.3] = -1
    nbr = jnp.asarray(nbr_np)
    occ_buf = jnp.asarray(
        rng.integers(0, 2, (bb, 8, B4_SLOTS), dtype=np.uint8)
    )
    sel = jnp.asarray(rng.integers(0, bb * B4_SLOTS, tv, dtype=np.int64),
                      jnp.int32)

    from linr_pcgc_tpu.runtime.dev_codec import _dev_ctx

    xg = _dev_ctx(params, cfg, code, nbr, jnp.int32(0))
    np.asarray(jnp.ravel(xg)[:1])

    for cs in (1, 2, 4):
        t = timed(
            f"_fused_probs cs={cs}",
            lambda b0, _cs=cs: _fused_probs(
                params, cfg, occ_buf, code, nbr, xg, sel, b0, _cs
            ),
            jnp.int32(0),
        )
        results[f"fused_probs_cs{cs}_s"] = t

    results["dev_ctx_s"] = timed(
        "_dev_ctx (x_glob)",
        lambda s: _dev_ctx(params, cfg, code, nbr, s), jnp.int32(0),
    )

    # split _fused_probs: the conv stack alone vs the sigmoid+sel-gather
    # epilogue (the compaction gather is tv scalar reads)
    from linr_pcgc_tpu.models.sb_network import sb_chunk_logits
    from functools import partial as _part

    @_part(jax.jit, static_argnames=("cs",))
    def logits_only(occ_b, b0, cs: int):
        mask = (code >= 0).astype(CDT)[:, None, None, :]
        geom = dict(nbr27=nbr, mask=mask, code=code, dtype=CDT)
        return sb_chunk_logits(
            params, cfg, geom, occ_b.astype(CDT), b0, cs, xg
        )

    results["logits_only_cs1_s"] = timed(
        "sb_chunk_logits cs=1", logits_only, occ_buf, jnp.int32(0), 1
    )

    @jax.jit
    def epilogue(lg):
        import jax.numpy as _j
        pr = jax.nn.sigmoid(lg.astype(_j.float32))
        prs = pr.transpose(1, 0, 2).reshape(1, -1)
        return _j.take(prs, sel, axis=1).astype(_j.float16)

    lg = logits_only(occ_buf, jnp.int32(0), 1)
    np.asarray(jnp.ravel(lg)[:1])
    results["probs_epilogue_s"] = timed("sigmoid+sel gather", epilogue, lg)

    # implied per-level-0 decode chain (8 stages) under each cs
    for cs in (1, 2, 4):
        chain = 8 * (results[f"fused_probs_cs{cs}_s"]
                     + results["rans_dec_seg_s"])
        print(f"implied L0 decode chain cs={cs}: {chain:.2f} s/chunk "
              f"({chain/4:.2f} s/frame)", flush=True)
        results[f"implied_l0_dec_cs{cs}_s_per_frame"] = chain / 4

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
