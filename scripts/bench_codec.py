"""Benchmark the production encode/decode paths (s/frame).

Reference baselines (RTX 3090, loot; BASELINE.md): encode ~0.42-0.44
s/frame, decode ~0.44-0.46 s/frame (codec path, excluding overfitting).

Usage:
    python scripts/bench_codec.py [--points 800000] [--frames 4] [--runs 2]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=800000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", type=str, default=None,
                    help="also write the JSON record here (committed "
                         "artifact, e.g. docs/BENCH_CODEC_r04.json) so "
                         "codec perf is driver-visible, not log-ware")
    ap.add_argument("--ac_compare", action="store_true",
                    help="also encode once over the AC wire and record "
                         "both wire sizes (rANS-vs-AC at bench scale)")
    args = ap.parse_args()

    import jax
    import numpy as np
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.runtime.codec import encode_gop_streams, decode_gop_streams

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    frames = [
        synthetic_cloud(args.points, depth=args.depth, seed=7, phase=0.08 * t)
        for t in range(args.frames)
    ]
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    pyrs = [ds[i] for i in range(args.frames)]
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(0), cfg)

    # warmup (compiles)
    t0 = time.time()
    blobs, bits = encode_gop_streams(params, cfg, pyrs)
    print(f"encode warmup {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    dec = decode_gop_streams(params, cfg, blobs, [p.low_coords for p in pyrs])
    print(f"decode warmup {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    for d, f in zip(dec, frames):
        gt = np.unique(f - f.min(axis=0), axis=0)
        assert np.array_equal(d, gt), "lossless check failed"

    # report timed runs only: phases that run on one codec side or skip
    # warmup would otherwise be mis-normalized (round-3 advisor)
    from linr_pcgc_tpu.runtime.dev_codec import PROF

    PROF.clear()

    t0 = time.time()
    for _ in range(args.runs):
        encode_gop_streams(params, cfg, pyrs)
    enc_s = (time.time() - t0) / (args.runs * args.frames)
    t0 = time.time()
    for _ in range(args.runs):
        decode_gop_streams(params, cfg, blobs, [p.low_coords for p in pyrs])
    dec_s = (time.time() - t0) / (args.runs * args.frames)

    points = sum(p.point_num for p in pyrs)
    rec = {
        "enc_s_per_frame": round(enc_s, 4),
        "dec_s_per_frame": round(dec_s, 4),
        "enc_vs_3090": round(0.43 / enc_s, 2),
        "dec_vs_3090": round(0.45 / dec_s, 2),
        "bpp_untrained": round(bits / points, 3),
        "points": points,
    }
    if PROF:
        rec["prof_per_frame"] = {
            k: round(v / (args.runs * args.frames), 4) if not k.endswith("bytes_down") and not k.endswith("bytes_up")
            else int(v / (args.runs * args.frames))
            for k, v in sorted(PROF.items())
        }
    def wire_bytes(bl):
        if isinstance(bl, dict) and "rans" in bl:
            return sum(len(b) for b in bl["rans"])
        return sum(len(b) for per_frame in bl for b in per_frame)

    rec["wire_bytes"] = wire_bytes(blobs)
    if args.ac_compare and os.environ.get("LINR_CODEC_ENTROPY") != "ac":
        # same probabilities, different entropy wire: the 16-bit staircase
        # rate parity is tested (tests/test_rans.py); this records the
        # HEADER overhead difference at bench scale (rANS pays per-lane
        # state+len, AC pays per-(frame,scale,stage) stream framing)
        os.environ["LINR_CODEC_ENTROPY"] = "ac"
        try:
            ac_blobs, _ = encode_gop_streams(params, cfg, pyrs)
            rec["wire_bytes_ac"] = wire_bytes(ac_blobs)
            rec["rans_vs_ac_pct"] = round(
                100.0 * (rec["wire_bytes"] / rec["wire_bytes_ac"] - 1.0), 2
            )
        finally:
            del os.environ["LINR_CODEC_ENTROPY"]

    from linr_pcgc_tpu.runtime.dev_codec import _probs_mode

    rec["probs_mode"] = _probs_mode()
    rec["config"] = {
        "points": args.points, "frames": args.frames,
        "depth": args.depth, "runs": args.runs,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
