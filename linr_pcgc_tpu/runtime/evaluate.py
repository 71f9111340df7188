"""Mid-training evaluation: real-rate measurement of a GOP checkpoint.

The reference's ``Test_one_gop`` (test_utils.py:16-163): load the
checkpoint, run the weight-codec roundtrip, run a real arithmetic encode +
decode with asserts over every frame, and report

    bpp_all = point_bpp + model_bpp + xyzlow_bpp

plus per-frame enc/dec times, written to ``result.json``.  Like the
reference's ``model.codec`` (model_core.py:170-227), the AC decode reuses
the encoder's probability tensors — the network-side symmetry is separately
guaranteed by construction (see runtime/codec.py) and separately tested by
the full decode pipeline.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax.numpy as jnp

from ..coding import (
    binary_encode_batch,
    binary_estimate_bits,
    pack_bitstream,
)
from ..coding.weights import compress_params, decompress_params
from ..models import ModelConfig, flatten_params, unflatten_params


def _gop_probs_and_bits(params, cfg: ModelConfig, pyramids):
    """Per-(scale, stage, frame) probability and ground-truth bit arrays,
    computed exactly like the production encoder — same backend dispatch,
    so the mid-test's real decode (which runs the production decoder)
    sees bit-identical probabilities."""
    from .codec import _use_sb

    if _use_sb(cfg):
        # identical frame sub-batching and executables to the production
        # encoder — the real decode reads these streams, so the f32
        # probability bits must match exactly
        from .dev_codec import encode_chunk_probs_dev, _frame_chunks

        f = len(pyramids)
        per_frame = [[] for _ in range(f)]
        for chunk in _frame_chunks(f):
            pyrs = [pyramids[i] for i in chunk]
            levels = encode_chunk_probs_dev(params, cfg, pyrs)
            for s, probs, bits in sorted(levels, key=lambda e: e[0]):
                for stage in range(cfg.outstage):
                    for j, i in enumerate(chunk):
                        per_frame[i].append(
                            (
                                s,
                                stage,
                                probs[stage][j],
                                bits[stage][j].astype(np.float32),
                            )
                        )
        return per_frame

    from .codec import _pad_level_coords, _prep_levels, _context_batched, _stage_probs_batched

    f = len(pyramids)
    per_frame = [[] for _ in range(f)]  # frame -> list over (scale, stage)
    for s in range(pyramids[0].scale_num):
        ns = [p.levels[s].n for p in pyramids]
        coords_np, b = _pad_level_coords([p.levels[s].coords for p in pyramids], ns)
        coords = jnp.asarray(coords_np)
        keys, code, nbr = _prep_levels(coords, jnp.asarray(ns, jnp.int32), cfg.kernel_size, cfg.dilations)
        x_glob = _context_batched(params, cfg, jnp.int32(s), code, nbr)
        occ_np = np.zeros((f, b, 8), np.float32)
        for i, p in enumerate(pyramids):
            occ_np[i, : ns[i]] = p.levels[s].occ[: ns[i]]
        perm = np.asarray(cfg.group_perm)
        occ_ctx = jnp.asarray(
            occ_np.transpose(0, 2, 1)[:, perm, :][:, : cfg.ctx_channels, :]
        )
        for g, grp in enumerate(cfg.groups):
            pr = np.asarray(
                _stage_probs_batched(params, cfg, jnp.int32(g), x_glob, occ_ctx, nbr)
            )
            for j, o in enumerate(grp):
                for i in range(f):
                    per_frame[i].append(
                        (s, g, pr[i, j, : ns[i]], occ_np[i, : ns[i], o])
                    )
    return per_frame


def frame_bit_heatmap(params, cfg: ModelConfig, pyr) -> list:
    """Per-point bit heatmap data (the reference's ``codec_with_point``,
    model_core.py:84-167): per scale, the parent coordinates, ground-truth
    occupancy, per-stage prediction quality 1 - |p - gt| and its -log2
    coding cost."""
    per_frame = _gop_probs_and_bits(params, cfg, [pyr])[0]
    out = []
    for s_idx, lev in enumerate(pyr.levels):
        entries = [e for e in per_frame if e[0] == s_idx]
        p = np.stack([e[2] for e in entries], axis=1)   # (n, 8)
        gt = np.stack([e[3] for e in entries], axis=1)  # (n, 8)
        quality = 1.0 - np.abs(p - gt)
        out.append(
            {
                "coords": lev.coords[: lev.n].copy(),
                "gt": gt,
                "quality": quality,
                "bits": -np.log2(np.maximum(quality, 1e-12)),
            }
        )
    return out


def _original_coords(pyr) -> np.ndarray:
    """Reconstruct the frame's original (min-subtracted) sorted coordinates
    from the finest pyramid level's occupancy — the decode target."""
    from ..ops.octree import OCTANT_OFFSETS

    lev = pyr.levels[0]
    c = lev.coords[: lev.n].astype(np.int64)
    occ = lev.occ[: lev.n].astype(bool)
    offs = np.asarray(OCTANT_OFFSETS, np.int64)
    children = (c[:, None, :] * 2 + offs[None]).reshape(-1, 3)
    children = children[occ.reshape(-1)]
    key = (children[:, 0] << 42) | (children[:, 1] << 21) | children[:, 2]
    return children[np.argsort(key, kind="stable")].astype(np.int32)


def test_one_gop(
    model_path: str,
    cfg: ModelConfig,
    pyramids: list,
    result_dir: str,
    write_flag: bool = False,
    low_bytes: bytes | None = None,
    logger=None,
) -> dict:
    from .codec import cfg_side_info, params_template, CFG_SIDE_BITS
    from .overfit import load_checkpoint

    if low_bytes is None and write_flag:
        raise ValueError("low_bytes required when write_flag is set")
    os.makedirs(result_dir, exist_ok=True)
    bins_dir = os.path.join(result_dir, "bins")
    if write_flag:
        os.makedirs(bins_dir, exist_ok=True)
        with open(os.path.join(bins_dir, "low_enc_bytes.bin"), "wb") as f:
            f.write(low_bytes)

    template = params_template(cfg)
    params, _, meta = load_checkpoint(model_path, template)
    bitdepth = meta.get("bitdepth", 8)

    # Weight-codec roundtrip with equality assert (compress_test semantics,
    # model_size_est.py:377-387).
    enc_time = dec_time = 0.0
    st = time.time()
    flat = np.asarray(flatten_params(params))
    comp = compress_params(flat, bitdepth)
    enc_time += time.time() - st
    st = time.time()
    recon = decompress_params(len(flat), comp["side_info"], comp["final_bytes"])
    dec_time += time.time() - st
    assert np.array_equal(recon, comp["recon"]), "weight codec roundtrip failed"
    params_used = unflatten_params(template, jnp.asarray(recon))

    if write_flag:
        with open(os.path.join(bins_dir, "model.bin"), "wb") as f:
            f.write(comp["final_bytes"])
    with open(os.path.join(result_dir, "side_info.json"), "w") as f:
        json.dump(
            dict(comp["side_info"], model_cfg=cfg_side_info(cfg)), f, indent=4
        )

    # Encode: network forward for the whole GOP + batched AC encode.
    st = time.time()
    per_frame = _gop_probs_and_bits(params_used, cfg, pyramids)
    t_net = time.time() - st
    probs = [e[2] for frame in per_frame for e in frame]
    bits = [e[3] for frame in per_frame for e in frame]
    st = time.time()
    streams = binary_encode_batch(probs, bits)
    t_enc = time.time() - st

    bits_est = sum(binary_estimate_bits(p, b) for p, b in zip(probs, bits))
    points = sum(p.point_num for p in pyramids)
    # real point bits = packed per (frame, scale) like the encoder
    bits_real = 0
    s_num = pyramids[0].scale_num
    frame_blobs = []
    for i, frame in enumerate(per_frame):
        blobs = []
        for s in range(s_num):
            idxs = [j for j, e in enumerate(frame) if e[0] == s]
            base = i * s_num * 8  # 8 bit-streams per (frame, scale)
            blob = pack_bitstream([streams[base + j] for j in idxs])
            bits_real += len(blob) * 8
            blobs.append(blob)
            if write_flag:
                with open(
                    os.path.join(bins_dir, f"frame{i:04d}_scale{s}.bin"), "wb"
                ) as f:
                    f.write(blob)
        frame_blobs.append(blobs)

    # Decode: the REAL stage-serial pipeline, timed separately from the
    # encode pass (the reference times distinct enc and dec network runs,
    # model_core.py:170-227 — reusing the encode pass for both would
    # double-count it), with the end-to-end losslessness assert
    # (decoder.py:140 semantics).
    from .codec import decode_gop_streams

    lows = [p.low_coords for p in pyramids]
    st = time.time()
    decoded = decode_gop_streams(params_used, cfg, frame_blobs, lows)
    t_dec = time.time() - st
    for i, (dec, pyr) in enumerate(zip(decoded, pyramids)):
        gt = _original_coords(pyr)
        assert dec.shape == gt.shape and np.array_equal(dec, gt), (
            f"frame {i} mid-test decode mismatch"
        )

    enc_time += t_net + t_enc
    dec_time += t_dec
    model_bits = comp["bit_real"] + CFG_SIDE_BITS
    low_bits = len(low_bytes) * 8 if low_bytes is not None else 0
    n_frames = len(pyramids)
    result = {
        "bpp_all": (bits_real + model_bits + low_bits) / points,
        "point_bpp": bits_real / points,
        "point_bpp_val": bits_est / points,
        "model_bpp": model_bits / points,
        "xyzlow_bpp": low_bits / points,
        "enc_mode": comp["enc_mode"],
        "enc_time": enc_time / n_frames,
        "dec_time": dec_time / n_frames,
    }
    with open(os.path.join(result_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=4)
    return result
