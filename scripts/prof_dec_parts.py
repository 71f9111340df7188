"""Time the PRODUCTION decode executables exactly as the codec calls
them (same jitted functions, same shapes, dispatch-loop + one sync) at
level-0 chunk shapes — reconciles the microbenches with the end-to-end
decode (round 5: unperturbed dec 2.82 s/frame is ~6x the sum of naive
probe estimates; find the real device costs).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_dec_parts.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=800000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--only", type=str, default="",
                    help="comma list of probe names to run (default all)")
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
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset, bucket_size
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.ops.rans import (
        LANES, build_words_table, rans_initial_states,
    )
    from linr_pcgc_tpu.runtime import dev_codec as dc

    def log(m):
        print(m, file=sys.stderr, flush=True)

    log(f"devices: {jax.devices()}")
    f = args.frames
    frames = [
        synthetic_cloud(args.points, depth=10, seed=7, phase=0.08 * t)
        for t in range(f)
    ]
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    pyrs = [ds[i] for i in range(f)]
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(0), cfg)

    # build REAL level-0 geometry through the production encoder-side path
    s = 0
    shapes = dc._LevelShapes(
        ds.scale_num, [p.low_coords.astype(np.int32) for p in pyrs]
    )
    for lv in range(ds.scale_num - 1, -1, -1):
        shapes.set_counts(lv, [p.levels[lv].n for p in pyrs])
    shapes.set_top_coords(
        ds.scale_num - 2,
        [p.levels[ds.scale_num - 2].coords[: p.levels[ds.scale_num - 2].n]
         for p in pyrs],
    )
    bv, cap, tv = shapes.buckets(s)
    counts = shapes.n_vox[s]
    coords_np = np.zeros((f, bv, 3), np.int32)
    for i, p in enumerate(pyrs):
        n = p.levels[s].n
        coords_np[i, :n] = p.levels[s].coords[:n]
    coords, keys = dc._init_level(
        jnp.asarray(coords_np), jnp.asarray(counts, jnp.int32), bv
    )
    log(f"level 0: bv={bv} cap={cap} tv={tv} f={f}")

    def timed(name, fn, sync_arr_of):
        """Dispatch-loop timing: r dispatches then ONE sync; slope of
        r vs 2r cancels the tail latency."""
        def run(n):
            out = None
            for _ in range(n):
                out = fn()
            np.asarray(jnp.ravel(sync_arr_of(out))[:1])
            return out

        out = run(1)  # compile
        t0 = time.time()
        run(args.reps)
        t1 = time.time() - t0
        t0 = time.time()
        run(2 * args.reps)
        t2 = time.time() - t0
        ms = (t2 - t1) / args.reps * 1000
        log(f"{name}: {ms:.1f} ms")
        return round(ms, 1), out

    results = {}

    # brickify (gp inputs unavailable standalone -> time the sort path
    # AND the gp path with synthetic parent maps of the right shapes)
    ms, geo = timed(
        "brickify_sort",
        lambda: dc._brickify_level(
            coords, keys, jnp.asarray(counts, jnp.int32), jnp.int32(s),
            cap, tv,
        ),
        lambda g: g["nbr27"],
    )
    results["brickify_sort"] = ms

    bv1 = bucket_size(max(p.levels[1].n for p in pyrs))
    bv2 = bucket_size(max(p.levels[2].n for p in pyrs))
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(
        rng.integers(0, bv1, size=(f, bv)).astype(np.int32)
    )
    p2 = jnp.asarray(
        rng.integers(0, bv2, size=(f, bv1)).astype(np.int32)
    )
    k2 = keys[:, :bv2] if bv >= bv2 else jnp.pad(keys, ((0, 0), (0, bv2 - bv)))
    ms, _ = timed(
        "brickify_gp",
        lambda: dc._brickify_level_gp(
            coords, keys, jnp.asarray(counts, jnp.int32), jnp.int32(s),
            p1, p2, k2, cap, tv,
        ),
        lambda g: g["nbr27"],
    )
    results["brickify_gp"] = ms

    ms, xg = timed(
        "dev_ctx",
        lambda: dc._dev_ctx(
            params, cfg, geo["code"], geo["nbr27"], jnp.int32(s)
        ),
        lambda x: x,
    )
    results["dev_ctx"] = ms

    occ_buf, vox_occ = dc._zero_buffers(f, cap, bv)
    cs = dc._fused_cs(geo["code"].shape[0], cfg, dc._fused_budget_gb(),
                      dc._fused_cs_cap())
    log(f"fused cs={cs}")
    ms, pr = timed(
        f"fused_probs_cs{cs}",
        lambda: dc._fused_probs(
            params, cfg, occ_buf, geo["code"], geo["nbr27"], xg,
            geo["sel"], jnp.int32(2), cs, False,
        ),
        lambda p: p,
    )
    results[f"fused_probs_cs{cs}"] = ms

    # fused_probs decomposition: where do the ~500 ms go?
    from functools import partial as _p
    from linr_pcgc_tpu.models.sb_network import sb_chunk_logits

    @_p(jax.jit, static_argnames=("cfgs", "css"))
    def _probs_logits_only(par, cfgs, occ_b, code, nbr, xgl, base, css):
        mask = (code >= 0).astype(dc.CDT)[:, None, None, :]
        geom = dict(nbr27=nbr, mask=mask, code=code, dtype=dc.CDT)
        return sb_chunk_logits(
            par, cfgs, geom, occ_b.astype(dc.CDT), base, css, xgl
        )

    ms, lg = timed(
        "probs_logits_only",
        lambda: _probs_logits_only(
            params, cfg, occ_buf, geo["code"], geo["nbr27"], xg,
            jnp.int32(2), cs,
        ),
        lambda p: p,
    )
    results["probs_logits_only"] = ms

    @_p(jax.jit, static_argnames=("css",))
    def _probs_tail(lgt, sel, css):
        pr_ = jax.nn.sigmoid(lgt.astype(jnp.float32))
        prs = pr_.transpose(1, 0, 2).reshape(css, -1)
        return jnp.take(prs, sel, axis=1).astype(jnp.float16)

    ms, _ = timed(
        "probs_tail_sigmoid_take",
        lambda: _probs_tail(lg, geo["sel"], cs),
        lambda p: p,
    )
    results["probs_tail_sigmoid_take"] = ms

    # rans decode + scatter against a real-sized words table
    stream = jnp.asarray(
        rng.integers(0, 256, size=bucket_size(2_600_000)).astype(np.uint8)
    )
    words = build_words_table(stream)
    states = rans_initial_states()
    cursors = jnp.zeros((LANES,), jnp.int32)
    bits_acc = jnp.zeros((cfg.outstage, tv), jnp.uint8)
    prr = pr[0]

    def rans_step():
        # donation: pass fresh copies of donated args each call
        return dc._rans_dec_stage_scatter(
            states + 0, cursors + 0, words, prr, geo["vox_fr"],
            geo["vox_j"], jnp.int32(sum(counts)), bits_acc + 0,
            occ_buf + 0, jnp.int32(3), geo["vox_brick"], geo["vox_slot"],
        )

    ms, _ = timed("rans_dec_scatter", rans_step, lambda o: o[3])
    results["rans_dec_scatter"] = ms

    ms, _ = timed(
        "vox_occ_from_bits",
        lambda: dc._vox_occ_from_bits(
            bits_acc, geo["vox_fr"], geo["vox_j"],
            jnp.int32(sum(counts)), f, bv,
        ),
        lambda v: v,
    )
    results["vox_occ_from_bits"] = ms

    ms, _ = timed(
        "pack_tv", lambda: dc._pack_tv(bits_acc), lambda v: v
    )
    results["pack_tv"] = ms

    per_level0 = (
        results["brickify_gp"] + results["dev_ctx"]
        + 8 * (results[f"fused_probs_cs{cs}"] + results["rans_dec_scatter"])
        + results["vox_occ_from_bits"] + results["pack_tv"]
    )
    results["level0_dec_model_ms"] = round(per_level0, 1)
    log(f"modelled level-0 decode: {per_level0:.0f} ms/chunk "
        f"({per_level0/1000/f:.3f} s/frame)")
    print(json.dumps({"bv": bv, "cap": cap, "tv": tv, "cs": cs,
                      "ms": results}))


if __name__ == "__main__":
    main()
