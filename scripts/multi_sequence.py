"""Multi-sequence batch driver: overfit/encode/decode many sequences as
independent jobs (the DCN level of parallelism; SURVEY.md section 2.4).

Each sequence is an embarrassingly parallel job — no cross-job
communication — so scaling across hosts is process-level.  On a single
host this driver runs them one after another (one TPU chip) or
concurrently with ``--procs N`` when several accelerators/processes make
sense (e.g. CPU decode farms).

Usage:
    python scripts/multi_sequence.py --seq data/8iVFB/loot data/8iVFB/soldier \
        --workdir out/ --frame_num 96 --gop_size 32 --first_epoch 100 \
        --others_epoch 30 [--procs 1]
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", nargs="+", required=True, help="sequence PLY dirs")
    ap.add_argument("--workdir", default="out_multi")
    ap.add_argument("--procs", type=int, default=1)
    ap.add_argument("--frame_num", type=int, default=4)
    ap.add_argument("--gop_size", type=int, default=4)
    ap.add_argument("--first_epoch", type=int, default=100)
    ap.add_argument("--others_epoch", type=int, default=100)
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="extra flags passed through to the CLI")
    args = ap.parse_args()

    jobs = []
    for seq in args.seq:
        name = os.path.basename(os.path.normpath(seq))
        cmd = [
            sys.executable, "-m", "linr_pcgc_tpu.cli",
            "--overfit", "True", "--encode", "True", "--decode", "True",
            "--ori_dir", seq,
            "--handle_dir", os.path.join(args.workdir, "tmp", name),
            "--result_dir", os.path.join(args.workdir, "out", name),
            "--encode_dir", os.path.join(args.workdir, "enc", name),
            "--decode_dir", os.path.join(args.workdir, "dec", name),
            "--frame_num", str(args.frame_num),
            "--gop_size", str(args.gop_size),
            "--first_epoch", str(args.first_epoch),
            "--others_epoch", str(args.others_epoch),
        ] + args.extra
        jobs.append((name, cmd))

    running = []
    failed = []
    env = {**os.environ, "PYTHONPATH": REPO + ":" + os.environ.get("PYTHONPATH", "")}
    for name, cmd in jobs:
        while len(running) >= args.procs:
            done_name, p = running.pop(0)
            if p.wait() != 0:
                failed.append(done_name)
        print(f"[multi_sequence] launching {name}")
        running.append((name, subprocess.Popen(cmd, env=env)))
    for done_name, p in running:
        if p.wait() != 0:
            failed.append(done_name)
    if failed:
        print(f"[multi_sequence] FAILED: {failed}")
        sys.exit(1)
    print(f"[multi_sequence] all {len(jobs)} sequences done")


if __name__ == "__main__":
    main()
