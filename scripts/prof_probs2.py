"""Decompose sb_chunk_logits (the codec probs core, 478 ms of the 522 ms
production fused_probs dispatch at level-0 chunk shapes) into cumulative
prefixes on REAL geometry — finds where the unexplained ~380 ms live
(the 5 halo convs at S=2 only account for ~80-100 ms).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_probs2.py
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
    from functools import partial
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.models.sb_network import (
        _occ_context_input, _sb_block, _sb_mlp2, sbconv3,
    )
    from linr_pcgc_tpu.models.network import stack_outer_blocks
    from linr_pcgc_tpu.ops.superbricks import B4_SLOTS
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
    geo = dc._brickify_level(
        coords, keys, jnp.asarray(counts, jnp.int32), jnp.int32(s), cap, tv
    )
    xg = dc._dev_ctx(params, cfg, geo["code"], geo["nbr27"], jnp.int32(s))
    occ_buf, _ = dc._zero_buffers(f, cap, bv)
    cs = 2
    CDT = dc.CDT

    def timed(name, fn, sync_arr_of):
        def run(n):
            out = None
            for _ in range(n):
                out = fn()
            np.asarray(jnp.ravel(sync_arr_of(out))[:1])
            return out

        run(1)
        t0 = time.time()
        run(args.reps)
        t1 = time.time() - t0
        t0 = time.time()
        run(2 * args.reps)
        t2 = time.time() - t0
        ms = (t2 - t1) / args.reps * 1000
        log(f"{name}: {ms:.1f} ms")
        return round(ms, 1)

    k = cfg.outstage - 1
    results = {}

    @partial(jax.jit, static_argnames=("stage",))
    def p_ctx_input(par, occ_b, code, stage: int):
        mask = (code >= 0).astype(CDT)[:, None, None, :]
        geom = dict(mask=mask, code=code, dtype=CDT)
        occ_f = occ_b.astype(CDT)
        rows = jnp.int32(2) + jnp.arange(cs)
        tri = (rows[:, None] > jnp.arange(k)[None, :]).astype(CDT)
        return _occ_context_input(occ_f[:, :k, :], tri, geom, True)

    ms = timed(
        "ctx_input",
        lambda: p_ctx_input(params, occ_buf, geo["code"], 2),
        lambda x: x,
    )
    results["ctx_input"] = ms

    @jax.jit
    def p_ctx_block(par, occ_b, code, nbr):
        mask = (code >= 0).astype(CDT)[:, None, None, :]
        geom = dict(nbr27=nbr, mask=mask, code=code, dtype=CDT)
        occ_f = occ_b.astype(CDT)
        rows = jnp.int32(2) + jnp.arange(cs)
        tri = (rows[:, None] > jnp.arange(k)[None, :]).astype(CDT)
        occ_in = _occ_context_input(occ_f[:, :k, :], tri, geom, True)
        st = stack_outer_blocks(par, cfg)
        idx = jnp.clip(rows - 1, 0)
        tk = lambda a: jnp.take(a, idx, axis=0)
        outer = {
            "conv_in": {"w": tk(st["conv_in_w"]), "b": tk(st["conv_in_b"])},
            "irn": jax.tree_util.tree_map(tk, st["irn"]),
            "conv_out": jax.tree_util.tree_map(tk, st["conv_out"]),
        }
        return _sb_block(occ_in, geom, outer)

    ms = timed(
        "ctx_block",
        lambda: p_ctx_block(params, occ_buf, geo["code"], geo["nbr27"]),
        lambda x: x,
    )
    results["ctx_block"] = ms

    @jax.jit
    def p_prune_mlp(par, xgl, ctx, code, nbr):
        mask = (code >= 0).astype(CDT)[:, None, None, :]
        geom = dict(nbr27=nbr, mask=mask, code=code, dtype=CDT)
        rows = jnp.int32(2) + jnp.arange(cs)
        gate = (rows > 0).astype(CDT)
        ctx_full = xgl + gate[None, :, None] * ctx
        tr = lambda a: jnp.take(a, rows, axis=0)
        h = sbconv3(
            ctx_full, geom, tr(par["prune"]["w"]), tr(par["prune"]["b"])
        )
        return _sb_mlp2(
            h, geom,
            {"w": tr(par["inner_mlp"]["l0"]["w"]),
             "b": tr(par["inner_mlp"]["l0"]["b"])},
            {"w": tr(par["inner_mlp"]["l1"]["w"]),
             "b": tr(par["inner_mlp"]["l1"]["b"])},
        )

    ctx0 = p_ctx_block(params, occ_buf, geo["code"], geo["nbr27"])
    ms = timed(
        "prune_mlp",
        lambda: p_prune_mlp(params, xg, ctx0, geo["code"], geo["nbr27"]),
        lambda x: x,
    )
    results["prune_mlp"] = ms

    print(json.dumps({"cap": cap, "cs": cs, "ms": results}))


if __name__ == "__main__":
    main()


def _two_way():
    """Methodology check: time p_ctx_block-equivalent work dispatch-loop
    vs scan-chained on the same real inputs (run via --two_way)."""
