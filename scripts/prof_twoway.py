
"""Two-way timing of the ctx block at real level-0 codec shapes:
dispatch-loop vs scan-chain — validates which timing method (and which
cost) is real.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_twoway.py
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
    from jax import lax
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.models.sb_network import _occ_context_input, _sb_block
    from linr_pcgc_tpu.models.network import stack_outer_blocks
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
    occ_buf, _ = dc._zero_buffers(f, cap, bv)
    CDT = dc.CDT
    cs, k = 2, cfg.outstage - 1
    code, nbr = geo["code"], geo["nbr27"]
    r = 6

    def block_of(occ_f, x_seed):
        mask = (code >= 0).astype(CDT)[:, None, None, :]
        geom = dict(nbr27=nbr, mask=mask, code=code, dtype=CDT)
        rows = jnp.int32(2) + jnp.arange(cs)
        tri = (rows[:, None] > jnp.arange(k)[None, :]).astype(CDT)
        occ_in = _occ_context_input(occ_f[:, :k, :], tri, geom, True)
        occ_in = occ_in + x_seed  # carry dependence for the scan chain
        st = stack_outer_blocks(params, cfg)
        idx = jnp.clip(rows - 1, 0)
        tk = lambda a: jnp.take(a, idx, axis=0)
        outer = {
            "conv_in": {"w": tk(st["conv_in_w"]), "b": tk(st["conv_in_b"])},
            "irn": jax.tree_util.tree_map(tk, st["irn"]),
            "conv_out": jax.tree_util.tree_map(tk, st["conv_out"]),
        }
        return _sb_block(occ_in, geom, outer)

    occ_f = occ_buf.astype(CDT)
    seed0 = jnp.zeros((cap * f, cs, 64 * 7), CDT)

    # A: dispatch loop
    fn = jax.jit(lambda o, x: block_of(o, x))
    out = fn(occ_f, seed0)
    np.asarray(jnp.ravel(out)[:1])

    def loop(n):
        o = None
        for _ in range(n):
            o = fn(occ_f, seed0)
        np.asarray(jnp.ravel(o)[:1])

    t0 = time.time(); loop(r); t1 = time.time() - t0
    t0 = time.time(); loop(2 * r); t2 = time.time() - t0
    log(f"dispatch_loop: {(t2 - t1) / r * 1000:.1f} ms")

    # B: scan chain (carry feeds the block input)
    def scan_fn(n):
        @jax.jit
        def g(x0, o):
            def body(xc, _):
                y = block_of(o, xc[:, :, : 64 * 7])
                return y[:, :, : 64 * 7] * jnp.asarray(1e-3, CDT), ()

            x, _ = lax.scan(body, x0, None, length=n)
            return x

        y = g(seed0[:, :, : 64 * 7], occ_f)
        np.asarray(jnp.ravel(y)[:1])
        t0 = time.time()
        y = g(seed0[:, :, : 64 * 7], occ_f)
        np.asarray(jnp.ravel(y)[:1])
        return time.time() - t0

    t1 = scan_fn(r)
    t2 = scan_fn(2 * r)
    log(f"scan_chain: {(t2 - t1) / r * 1000:.1f} ms")


if __name__ == "__main__":
    main()
