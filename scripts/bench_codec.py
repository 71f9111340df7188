"""Benchmark the production encode/decode paths (s/frame).

Reference baselines (RTX 3090, loot; BASELINE.md): encode ~0.42-0.44
s/frame, decode ~0.44-0.46 s/frame (codec path, excluding overfitting)
— measured AT CONVERGENCE, so the headline here is the TRAINED rate
point (the untrained ~11.6 bpp wire inflates every wire-bound term ~23x
through the dev tunnel; round-4 verdict missing #2).

Usage:
    python scripts/bench_codec.py [--points 800000] [--frames 4] [--runs 2]
        [--train_epochs 20] [--ckpt path.npz]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _trained_params(args, cfg, pyrs, log):
    """Overfit ``train_epochs`` epochs on the bench GOP (cached npz keyed
    by the bench config) — the realistic ~0.5-0.6 bpp rate point."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from linr_pcgc_tpu.models import init_params
    from linr_pcgc_tpu.runtime import TrainConfig, adam_init
    from linr_pcgc_tpu.runtime.sb_overfit import (
        assemble_gop_superbricks,
        make_epoch_fn_sb,
    )
    from linr_pcgc_tpu.models.network import flatten_params, unflatten_params
    from linr_pcgc_tpu.runtime.codec import params_template

    if args.ckpt and os.path.exists(args.ckpt):
        flat = np.load(args.ckpt)["flat"]
        log(f"loaded trained params from {args.ckpt}")
        return unflatten_params(params_template(cfg), flat)
    cache = os.path.join(
        args.workdir,
        f"ckpt_p{args.points}_f{args.frames}_d{args.depth}"
        f"_e{args.train_epochs}.npz",
    )
    if os.path.exists(cache):
        flat = np.load(cache)["flat"]
        log(f"loaded cached trained params from {cache}")
        return unflatten_params(params_template(cfg), flat)
    tc = TrainConfig()
    batch = assemble_gop_superbricks(pyrs)
    epoch_fn = make_epoch_fn_sb(cfg, tc, batch.level_slices)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = adam_init(params)
    lr = jnp.asarray(tc.learning_rate, jnp.float32)
    k = jnp.zeros((), jnp.int32)
    t0 = time.time()
    for ep in range(args.train_epochs):
        params, opt, lr, k, losses = epoch_fn(params, opt, lr, k, batch)
        if ep % 5 == 0 or ep == args.train_epochs - 1:
            log(
                f"train epoch {ep}: loss "
                f"{float(np.mean(np.asarray(losses))):.4f} "
                f"({time.time()-t0:.0f}s)"
            )
    os.makedirs(args.workdir, exist_ok=True)
    np.savez(cache, flat=np.asarray(flatten_params(params)))
    log(f"trained {args.train_epochs} epochs in {time.time()-t0:.0f}s "
        f"-> {cache}")
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=800000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--train_epochs", type=int, default=20,
                    help="overfit this many epochs for the trained rate "
                         "point (0 = untrained-only, the pre-round-5 "
                         "behavior)")
    ap.add_argument("--ckpt", type=str, default=None,
                    help="reuse a flat-npz checkpoint (e.g. from "
                         "rate_loot.py) instead of training in-script")
    ap.add_argument("--workdir", type=str, default="/tmp/linr_bench_codec")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the JSON record here (committed "
                         "artifact, e.g. docs/BENCH_CODEC_r04.json) so "
                         "codec perf is driver-visible, not log-ware")
    ap.add_argument("--ac_compare", action="store_true",
                    help="also encode once over the AC wire and record "
                         "both wire sizes (rANS-vs-AC at bench scale)")
    args = ap.parse_args()

    from linr_pcgc_tpu.utils.jax_cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    )

    import jax
    import numpy as np
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.runtime.codec import encode_gop_streams, decode_gop_streams

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    log(f"devices: {jax.devices()}")
    frames = [
        synthetic_cloud(args.points, depth=args.depth, seed=7, phase=0.08 * t)
        for t in range(args.frames)
    ]
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    pyrs = [ds[i] for i in range(args.frames)]
    cfg = ModelConfig(scale_num=ds.scale_num)
    if args.train_epochs > 0 or args.ckpt:
        params = _trained_params(args, cfg, pyrs, log)
        trained = True
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)
        trained = False

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
        "trained": trained,
        ("bpp_trained" if trained else "bpp_untrained"):
            round(bits / points, 3),
        "train_epochs": args.train_epochs if trained else 0,
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
