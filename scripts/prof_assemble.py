"""Profile the host-side superbrick GOP assembly (VERDICT r2 weak #4:
5.5 s/frame at 800k pts) — per-phase timings to direct the vectorization.

Run CPU-only:
    env -u PYTHONPATH JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python scripts/prof_assemble.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
    from linr_pcgc_tpu.ops.superbricks import build_superbrick_level

    n_points = int(os.environ.get("PROF_POINTS", "800000"))
    t0 = time.time()
    frames = [synthetic_cloud(n_points, depth=10, seed=7, phase=0.08 * t) for t in range(1)]
    print(f"gen: {time.time()-t0:.2f}s")
    t0 = time.time()
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    pyr = ds[0]
    print(f"pyramid: {time.time()-t0:.2f}s scale_num={ds.scale_num}")

    # per-level build timings with an instrumented replica
    import linr_pcgc_tpu.ops.superbricks as sbmod

    for s in range(pyr.scale_num):
        lev = pyr.levels[s]
        coords = lev.coords[: lev.n]
        occ = lev.occ[: lev.n]
        fc = lev.feat_code[: lev.n]
        t0 = time.time()
        out = build_superbrick_level(coords, occ, fc, s, side=4)
        dt = time.time() - t0
        print(f"level {s}: n={lev.n:8d} bricks={out.n_bricks:7d} build={dt*1e3:8.1f} ms")

    # phase breakdown for level 0
    lev = pyr.levels[0]
    coords = lev.coords[: lev.n]
    occ = lev.occ[: lev.n].astype(np.uint8)
    fc = lev.feat_code[: lev.n]
    side, shift, m, slots = 4, 2, 3, 64
    c = coords.astype(np.int64)
    t0 = time.time(); bkey = sbmod._np_key(coords >> shift); t1 = time.time()
    brick_keys, inv = np.unique(bkey, return_inverse=True); t2 = time.time()
    slot = (((c[:, 0] & m) << (2 * shift)) | ((c[:, 1] & m) << shift) | (c[:, 2] & m)).astype(np.int32)
    t3 = time.time()
    bb = len(brick_keys)
    scale_code = np.full((bb, slots), -1, np.int32)
    scale_code[inv, slot] = fc.astype(np.int32)
    t4 = time.time()
    occ_b = np.zeros((bb, 8, slots), np.uint8)
    occ_b[inv, :, slot] = occ
    t5 = time.time()
    doff = np.asarray(
        [(dx << 42) + (dy << 21) + dz for (dx, dy, dz) in sbmod._DIRS],
        np.int64,
    )
    qkey = brick_keys[:, None] + doff[None, :]
    t5b = time.time()
    pos = np.searchsorted(brick_keys, qkey)
    t5c = time.time()
    pos_c = np.minimum(pos, bb - 1)
    hit = brick_keys[pos_c] == qkey
    nbr = np.where(hit, pos_c, -1).astype(np.int32)
    t6 = time.time()
    print(f"  nbr sub: qkey={1e3*(t5b-t5):.1f} search={1e3*(t5c-t5b):.1f} rest={1e3*(t6-t5c):.1f}")
    print(
        f"level0 phases (ms): key={1e3*(t1-t0):.1f} unique={1e3*(t2-t1):.1f} "
        f"slot={1e3*(t3-t2):.1f} code-scatter={1e3*(t4-t3):.1f} "
        f"occ-scatter={1e3*(t5-t4):.1f} nbr={1e3*(t6-t5):.1f}"
    )

    # full assemble (host compute + upload)
    from linr_pcgc_tpu.runtime.sb_overfit import assemble_gop_superbricks

    t0 = time.time()
    batch = assemble_gop_superbricks([pyr])
    import jax

    jax.block_until_ready(batch.occ)
    print(f"assemble_gop_superbricks(1 frame): {time.time()-t0:.2f}s "
          f"flat={batch.nbr27.shape[1]}")


if __name__ == "__main__":
    main()
