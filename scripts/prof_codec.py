"""Phase timing for the brick codec at production shapes."""

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
    import jax.numpy as jnp
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.runtime.sb_codec import (
        build_codec_level,
        sb_codec_ctx,
        sb_codec_stage_probs,
    )
    from linr_pcgc_tpu.coding import binary_encode_batch

    f = int(os.environ.get("F", "4"))
    frames = [
        synthetic_cloud(800000, depth=10, seed=7, phase=0.08 * t)
        for t in range(f)
    ]
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    pyrs = [ds[i] for i in range(f)]
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(__import__("jax").random.PRNGKey(0), cfg)

    s = 0  # finest level (the big one)
    t0 = time.time()
    level = build_codec_level(
        [p.levels[s].coords[: p.levels[s].n] for p in pyrs],
        s,
        [p.levels[s].occ[: p.levels[s].n] for p in pyrs],
    )
    print(f"build_codec_level(L0, F={f}): {time.time()-t0:.2f}s "
          f"(bricks={level.nbr27.shape[0]})", flush=True)

    code = jnp.asarray(level.code)
    nbr = jnp.asarray(level.nbr27)
    occ = jnp.asarray(level.occ)
    t0 = time.time()
    xg = sb_codec_ctx(params, cfg, code, nbr, level.slices)
    np.asarray(jnp.ravel(xg)[:1])
    print(f"ctx warm+run: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    xg = sb_codec_ctx(params, cfg, code, nbr, level.slices)
    np.asarray(jnp.ravel(xg)[:1])
    print(f"ctx steady: {time.time()-t0:.3f}s", flush=True)

    pr = sb_codec_stage_probs(params, cfg, code, nbr, occ, xg, jnp.int32(0))
    np.asarray(jnp.ravel(pr)[:1])
    t0 = time.time()
    for stage in range(8):
        pr = sb_codec_stage_probs(
            params, cfg, code, nbr, occ, xg, jnp.int32(stage)
        )
        pr_np = np.asarray(pr)
    print(f"8 stage calls (synced): {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    probs = []
    bits = []
    for (vb, vs, n) in level.voxel_maps:
        probs.append(pr_np[vb, vs])
        bits.append(level.occ[vb, 0, vs].astype(np.float32))
    print(f"voxel extraction (1 stage): {time.time()-t0:.3f}s", flush=True)

    t0 = time.time()
    streams = binary_encode_batch(probs, bits)
    print(f"AC encode (1 stage): {time.time()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
