"""One b4_convsm at codec level-0 shapes: synthetic vs REAL nbr27, S=2
and S=9 — pins down why the composed real block costs ~100 ms/conv when
synthetic probes said ~14 (round 5).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_conv_real.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
    from linr_pcgc_tpu.models import ModelConfig
    from linr_pcgc_tpu.ops.superbricks import B4_SLOTS, b4_convsm
    from linr_pcgc_tpu.runtime import dev_codec as dc

    def log(m):
        print(m, file=sys.stderr, flush=True)

    log(f"devices: {jax.devices()}")
    f = 4
    frames = [
        synthetic_cloud(800000, depth=10, seed=7, phase=0.08 * t)
        for t in range(f)
    ]
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    pyrs = [ds[i] for i in range(f)]
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
    nbr_real = geo["nbr27"]
    bb = nbr_real.shape[0]
    absent = float(np.mean(np.asarray(nbr_real) < 0))
    log(f"bb={bb}, real nbr absent fraction {absent:.2f}")

    rng = np.random.default_rng(0)
    nbr_syn_np = rng.integers(0, bb, size=(bb, 27)).astype(np.int32)
    nbr_syn_np[rng.uniform(size=(bb, 27)) < absent] = -1
    nbr_syn = jnp.asarray(nbr_syn_np)

    bf16 = jnp.bfloat16
    fn = jax.jit(b4_convsm)

    for sdim in (2, 9):
        x = jnp.asarray(
            rng.normal(size=(bb, sdim, B4_SLOTS * 8)) * 0.1, bf16
        )
        w = jnp.asarray(rng.normal(size=(sdim, 27, 8, 8)) * 0.1, jnp.float32)
        for name, nbr in (("real", nbr_real), ("syn", nbr_syn)):
            y = fn(x, w, nbr)
            np.asarray(jnp.ravel(y)[:1])

            def loop(n):
                o = None
                for _ in range(n):
                    o = fn(x, w, nbr)
                np.asarray(jnp.ravel(o)[:1])

            t0 = time.time(); loop(6); t1 = time.time() - t0
            t0 = time.time(); loop(12); t2 = time.time() - t0
            log(f"conv S={sdim} nbr={name}: {(t2 - t1) / 6 * 1000:.1f} ms")


if __name__ == "__main__":
    main()
