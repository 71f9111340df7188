"""End-to-end verification driver: synthetic sequence through the CLI.

Generates a small synthetic dynamic sequence as PLY files, then runs the
production CLI (overfit -> encode -> decode).  The decoder asserts
losslessness per frame; this script additionally re-reads the decoded PLYs
and compares them against the inputs, and prints bitstream statistics.

Usage:
    python scripts/e2e_roundtrip.py [--points 4000] [--frames 4]
        [--gop_size 2] [--epochs 3] [--workdir /tmp/linr_e2e]
"""

import argparse
import glob
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linr_pcgc_tpu.data import synthetic_cloud, write_ply_ascii, read_ply
from linr_pcgc_tpu import cli


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=4000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--gop_size", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--depth", type=int, default=7)
    ap.add_argument("--workdir", type=str, default="/tmp/linr_e2e")
    args = ap.parse_args()

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    ori = os.path.join(wd, "ply")
    os.makedirs(ori)
    frames = []
    for t in range(args.frames):
        pts = synthetic_cloud(args.points, depth=args.depth, seed=3, phase=0.1 * t)
        frames.append(pts)
        write_ply_ascii(os.path.join(ori, f"frame{t:04d}.ply"), pts)
    print(f"wrote {args.frames} frames of ~{args.points} pts to {ori}")

    cli.main(
        [
            "--overfit", "True", "--encode", "True", "--decode", "True",
            "--mid_test", "True", "--check_freq", "2",
            "--ori_dir", ori,
            "--handle_dir", os.path.join(wd, "tmp"),
            "--result_dir", os.path.join(wd, "out"),
            "--encode_dir", os.path.join(wd, "enc"),
            "--decode_dir", os.path.join(wd, "dec"),
            "--frame_num", str(args.frames),
            "--gop_size", str(args.gop_size),
            "--first_epoch", str(args.epochs),
            "--others_epoch", str(max(1, args.epochs // 2)),
        ]
    )

    # independent losslessness check on the written PLYs
    total_bytes = 0
    for f in glob.glob(os.path.join(wd, "enc", "*", "bins", "*.bin")):
        total_bytes += os.path.getsize(f)
    total_points = 0
    for t in range(args.frames):
        dec = read_ply(os.path.join(wd, "dec", f"frame{t:04d}.ply"))
        gt = np.unique(frames[t], axis=0)
        assert np.array_equal(dec, gt), f"frame {t} PLY mismatch"
        total_points += len(gt)
    print(
        f"LOSSLESS: {args.frames} frames, {total_points} points, "
        f"bitstream {total_bytes} bytes, {8*total_bytes/total_points:.4f} bpp"
    )
    for rj in sorted(glob.glob(os.path.join(wd, "out", "*", "result.json"))):
        with open(rj) as f:
            entries = json.load(f)
        print(rj, "->", {k: v for k, v in entries[-1].items() if k in ("epoch", "loss")})
    print("E2E ROUNDTRIP PASSED")


if __name__ == "__main__":
    main()
