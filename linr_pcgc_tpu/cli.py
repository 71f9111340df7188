"""Command-line driver, flag-compatible with the reference ``main.py``
(/root/reference/main.py:480-541).

Example (mirrors the reference's usage on a directory of PLY frames):

    python -m linr_pcgc_tpu.cli \
        --overfit True --mid_test True --encode True --decode True \
        --ori_dir data/loot/Ply --handle_dir tmp/loot \
        --result_dir output/loot --encode_dir result_enc/loot \
        --decode_dir result_dec/loot \
        --frame_num 96 --gop_size 32 --first_epoch 100 --others_epoch 30

Boolean flags are strings compared to 'True' for drop-in compatibility
with the reference's scripts (its quirk, main.py:98,109-118).
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys

import numpy as np

from .models import ModelConfig
from .runtime import TrainConfig, overfit_gop, encode_gop, decode_gop
from .data import PyramidDataset
from .utils import set_logger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("LINR-PCGC (TPU)")
    p.add_argument("--others_epoch", default=100, type=int)
    p.add_argument("--first_epoch", default=100, type=int)
    p.add_argument("--gop_size", type=int, default=4)
    p.add_argument("--frame_num", type=int, default=4)
    p.add_argument("--learning_rate", default=0.01, type=float)
    p.add_argument("--gamma", type=float, default=0.992)
    p.add_argument("--min_lr", type=float, default=4e-4)
    p.add_argument("--decay_rate", type=float, default=1e-4)
    p.add_argument("--step_size", type=int, default=32)
    p.add_argument("--scale_num", type=int)
    p.add_argument("--min_point_num", type=int, default=64)
    p.add_argument("--load", default="False", type=str)
    p.add_argument("--pretrain_path", type=str)
    p.add_argument("--write_pth", type=str, default="True")
    p.add_argument("--seed", type=int, default=8807)
    p.add_argument("--delete_cache", type=str, default="False")
    p.add_argument("--write_real_bitstream", type=str, default="False")
    p.add_argument("--check_freq", type=int, default=5)
    p.add_argument("--resume", type=str, default="False",
                   help="continue an interrupted GOP from its own checkpoint")
    p.add_argument("--devices", type=int, default=1,
                   help="multi-chip training over N chips "
                        "(1 = sequential parity trainer)")
    p.add_argument("--parallel", type=str, default="sp",
                   choices=("sp", "gop"),
                   help="devices>1 layout: 'sp' = stage-parallel within "
                        "every GOP (min latency, exact sequential "
                        "semantics); 'gop' = after GOP 0, train N warm "
                        "GOPs concurrently, one per chip (max sequence "
                        "throughput, zero collectives)")
    p.add_argument("--gop_lanes", type=int, default=0,
                   help="with --parallel gop: number of concurrent GOPs "
                        "per wave (default = devices); when < devices, "
                        "each GOP lane trains (devices // gop_lanes)-way "
                        "stage-parallel on a 2-D gop x sp mesh — the "
                        "latency/throughput tradeoff knob")
    p.add_argument("--ori_dir", type=str, default="test_pc")
    p.add_argument("--ori_dtype", type=str, default="ply")
    p.add_argument("--handle_dir", type=str, default="tmp/test_pc")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--result_dir", type=str, default="output/test_pc")
    p.add_argument("--hidden_channel_mlp", type=int, default=24)
    p.add_argument("--mlp_out_channel", type=int, default=10)
    p.add_argument("--hidden_channel_conv", type=int, default=8)
    p.add_argument("--block_layers", type=int, default=1)
    p.add_argument("--block_type", type=str, default="inception",
                   choices=["inception", "resnet", "dilation"],
                   help="residual core inside blocks (resnet.py:146-162); "
                        "'dilation' (DilatedResNet) runs on the gather "
                        "backend")
    p.add_argument("--outstage", type=int, default=8,
                   choices=[8, 4, 3, 2, 1],
                   help="octant-bit stage grouping (get_stage_lst, "
                        "upsample.py:24-35); non-default groupings run on "
                        "the gather backend (the reference hardcodes 8, "
                        "main.py:97)")
    p.add_argument("--instage", type=int, default=1,
                   help="parent spatial grouping; only 1 (the value the "
                        "reference ever constructs) is implemented")
    p.add_argument("--model_bitdepth", type=int, default=8)
    p.add_argument("--overfit", type=str, default="False")
    p.add_argument("--mid_test", type=str, default="False")
    p.add_argument("--encode", type=str, default="False")
    p.add_argument("--encode_dir", type=str, default="result_enc/test_pc")
    p.add_argument("--decode", type=str, default="True")
    p.add_argument("--decode_dir", type=str, default="result_dec/test_pc")
    return p


def gop_groups(frame_num: int, gop_size: int):
    return [
        list(range(i, min(i + gop_size, frame_num)))
        for i in range(0, frame_num, gop_size)
    ]


def decode_standalone(args, logger) -> None:
    """Decode every GOP found under ``encode_dir`` from the bitstreams
    alone: no original dataset, model config from side_info.json
    (reference decoder independence, /root/reference/decoder.py:16-150)."""
    import glob as globmod

    gop_dirs = sorted(
        d
        for d in globmod.glob(os.path.join(args.encode_dir, "gop_*"))
        if os.path.isdir(os.path.join(d, "bins"))
    )
    if not gop_dirs:
        raise FileNotFoundError(f"no gop_* bitstreams under {args.encode_dir}")
    for enc_dir in gop_dirs:
        name = os.path.basename(enc_dir)
        start = int(name.split("_")[1])
        decode_gop(
            enc_dir,
            args.decode_dir,
            cfg=None,
            gop_start_idx=start,
            write_flag=True,
            logger=logger,
        )
        logger.info(f"{name}: decoded standalone")


def run(args, logger=None) -> None:
    """The overfit/encode/decode driver (reference ``overfit_enc_dec``,
    main.py:69-119)."""
    # Persistent XLA compile cache by default: a cold production encode
    # pays minutes of compilation (round-4 bench: 214 s) that the second
    # process should not repay.  Crash-safe copy-on-write view, see
    # utils/jax_cache.py.  LINR_JAX_CACHE overrides the location;
    # LINR_JAX_CACHE=0 disables.
    cache_base = os.environ.get(
        "LINR_JAX_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "linr_pcgc_tpu", "jax"
        ),
    )
    if cache_base not in ("0", "off", ""):
        from .utils.jax_cache import setup_compilation_cache

        setup_compilation_cache(cache_base)

    if logger is None:
        logger = logging.getLogger("linr_pcgc_tpu")
        if not logger.handlers:
            logger.addHandler(logging.StreamHandler(sys.stdout))
            logger.setLevel(logging.INFO)

    # decode-only without the original dataset: run from bitstreams alone
    if (
        args.decode == "True"
        and args.overfit != "True"
        and args.encode != "True"
        and args.mid_test != "True"
        and not os.path.exists(args.ori_dir)
    ):
        decode_standalone(args, logger)
        return

    dataset = PyramidDataset(
        args.ori_dir,
        handle_dir=args.handle_dir,
        scale_num=args.scale_num,
        ori_type=args.ori_dtype,
        min_point_num=args.min_point_num,
    )
    dataset[0]  # derive scale_num from frame 0 (main.py:77-79)
    scale_num = dataset.scale_num
    logger.info(f"scale_num: {scale_num}")

    cfg = ModelConfig(
        scale_num=scale_num,
        in_channel=7,
        hidden_channel_conv=args.hidden_channel_conv,
        hidden_channel_mlp=args.hidden_channel_mlp,
        block_layers=args.block_layers,
        block_type=args.block_type,
        outstage=args.outstage,
        instage=args.instage,
    )
    tc = TrainConfig(
        learning_rate=args.learning_rate,
        gamma=args.gamma,
        min_lr=args.min_lr,
        weight_decay=args.decay_rate,
        step_size=args.step_size,
    )

    groups = gop_groups(args.frame_num, args.gop_size)
    gop_names = [f"gop_{g[0]}_{g[-1]}" for g in groups]

    if args.overfit == "True":
        warm = args.pretrain_path if args.pretrain_path and os.path.exists(
            str(args.pretrain_path)
        ) else None
        first_model = None
        gop_par = (
            args.devices > 1
            and args.parallel == "gop"
            and args.mid_test != "True"
            and args.resume != "True"
            and cfg.kernel_size == 3
            and cfg.outstage == 8
            and cfg.block_type != "dilation"
        )
        if args.devices > 1 and args.parallel == "gop" and not gop_par:
            logger.info(
                "gop-parallel unavailable for this config (needs the "
                "superbrick backend, no --mid_test/--resume) — "
                "falling back to stage-parallel"
            )
        seq_groups = list(enumerate(groups))
        lanes = args.gop_lanes or args.devices
        sp_per_lane = 1
        if gop_par and args.gop_lanes:
            if args.devices % lanes or cfg.outstage % (args.devices // lanes):
                logger.info(
                    f"--gop_lanes {lanes} does not divide --devices "
                    f"{args.devices} into sp lanes dividing outstage "
                    f"{cfg.outstage} — using one GOP per chip"
                )
                lanes = args.devices
            else:
                sp_per_lane = args.devices // lanes
        if gop_par and len(groups) > 1:
            from .parallel import overfit_gops_parallel

            # GOP 0 trains first (all chips stage-parallel, min latency);
            # the warm GOPs then run in waves of `gop_lanes` concurrent
            # GOPs, each lane sp_per_lane-way stage-parallel (reference
            # main.py:98-104 makes warm GOPs independent).
            # Ragged-tail GOPs (shorter than gop_size) train sequentially.
            tail = [
                (i, g) for i, g in seq_groups[1:] if len(g) != len(groups[0])
            ]
            waves, cur = [], []
            for i, g in seq_groups[1:]:
                if len(g) == len(groups[0]):
                    cur.append((i, g))
                    if len(cur) == lanes:
                        waves.append(cur)
                        cur = []
            if cur:
                waves.append(cur)
            seq_groups = [seq_groups[0]] + tail
        else:
            waves = []
        for g_idx, group in seq_groups:
            epochs = args.first_epoch if g_idx == 0 else args.others_epoch
            # warm start: every later GOP starts from GOP 0's checkpoint
            # (main.py:98-104)
            start = warm if g_idx == 0 else first_model
            path = overfit_gop(
                dataset=dataset,
                group_range=group,
                epoch_num=epochs,
                cfg=cfg,
                tc=tc,
                result_dir=args.result_dir,
                warm_start_path=start,
                seed=args.seed,
                bitdepth=args.model_bitdepth,
                mid_test=args.mid_test == "True",
                check_freq=args.check_freq,
                write_pth=args.write_pth == "True",
                write_real_bitstream=args.write_real_bitstream == "True",
                handle_dir=args.handle_dir,
                resume=args.resume == "True",
                devices=args.devices,
                logger=logger,
            )
            if g_idx == 0:
                first_model = path
        for wave in waves:
            overfit_gops_parallel(
                dataset=dataset,
                group_ranges=[g for _, g in wave],
                epoch_num=args.others_epoch,
                cfg=cfg,
                tc=tc,
                result_dir=args.result_dir,
                warm_start_path=first_model,
                bitdepth=args.model_bitdepth,
                handle_dir=args.handle_dir,
                sp_devices=sp_per_lane,
                logger=logger,
            )

    if args.encode == "True":
        for group, name in zip(groups, gop_names):
            model_path = os.path.join(args.result_dir, name, "model.npz")
            pyrs = [dataset[i] for i in group]
            enc_dir = os.path.join(args.encode_dir, name)
            stats = encode_gop(model_path, pyrs, enc_dir, cfg, logger=logger)
            logger.info(f"{name}: encoded {stats['points']} points")

    if args.decode == "True":
        for group, name in zip(groups, gop_names):
            enc_dir = os.path.join(args.encode_dir, name)
            gt = lambda i, _g=group: dataset.raw_sorted_points(_g[0] + i)
            decode_gop(
                enc_dir,
                args.decode_dir,
                cfg,
                gop_start_idx=group[0],
                ground_truth=gt,
                write_flag=True,
                logger=logger,
            )

    if args.delete_cache == "True" and os.path.exists(args.handle_dir):
        shutil.rmtree(args.handle_dir)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    print(args)
    os.makedirs(args.result_dir, exist_ok=True)
    logger = set_logger(os.path.join(args.result_dir, "info.log"))
    run(args, logger)


if __name__ == "__main__":
    main()
