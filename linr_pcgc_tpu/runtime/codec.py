"""Production encode/decode pipelines.

Bitstream artifact layout matches the reference encoder/decoder
(/root/reference/encoder.py, decoder.py, test_utils.py):

    <dir>/side_info.json                 {mu, b, min_param, max_param,
                                          enc_mode, bitdepth}
    <dir>/bins/model.bin                 entropy-coded quantized weights
    <dir>/bins/low_enc_bytes.bin         base layer: per-frame raw uint8
                                         xyz triples + all frames' int32
                                         coordinate minima, length-prefixed
                                         (test_utils.py:199-232)
    <dir>/bins/frame{NNNN}_scale{s}.bin  pack_bitstream of the 8 per-stage
                                         occupancy AC streams of scale s

Encoder/decoder symmetry: probabilities on both sides come from the SAME
jitted executables (`level_context` + `stage_logits` + sigmoid) applied to
the same bucket-padded shapes, with the *dequantized* weights
(encoder.py:101-103), so the f32 probability streams are bit-identical by
construction.  Stage i's context depends only on occupancy channels < i,
which the decoder has already arithmetic-decoded; per level the decoder
therefore runs 8 device steps with a host AC call between them, while the
encoder (knowing ground truth) batches all 8 AC encodes into one
multithreaded native call.
"""

from __future__ import annotations

import glob as globmod
import json
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..coding import (
    binary_encode_batch,
    binary_decode,
    pack_bitstream,
    unpack_bitstream,
)
from ..coding.weights import compress_params, decompress_params
from ..data.dataset import FramePyramid, bucket_size, level_arrays_from_coords
from ..data.ply import write_ply_ascii
from ..models import ModelConfig, stage_logits, level_context, flatten_params, unflatten_params, init_params
from ..ops import octree_up

F32 = jnp.float32


# ------------------------------------------------------------ base layer --


def encode_low_all_frames(pyramids: list[FramePyramid]) -> bytes:
    """Base-layer codec: lowest-scale coords as raw uint8 triples per frame
    plus all frames' coordinate minima (int32), length-prefixed."""
    blobs = []
    mins = []
    for pyr in pyramids:
        low = pyr.low_coords
        if low.size and low.max() > 255:
            raise ValueError("lowest scale exceeds 8 bits; increase scale_num")
        blobs.append(low.astype(np.uint8).tobytes())
        mins.append(np.asarray(pyr.coord_min, np.int32))
    blobs.append(np.concatenate(mins).astype(np.int32).tobytes())
    return pack_bitstream(blobs)


def decode_low_all_frames(blob: bytes):
    parts = unpack_bitstream(blob)
    mins = np.frombuffer(parts.pop(), np.int32).reshape(-1, 3)
    lows = [np.frombuffer(p, np.uint8).reshape(-1, 3).astype(np.int32) for p in parts]
    return lows, mins


# --------------------------------------------------------- staged probs --


@partial(jax.jit, static_argnames=("cfg", "stage"))
def _stage_probs(params, cfg: ModelConfig, stage: int, x_glob, occ_known, nbr27):
    return jax.nn.sigmoid(stage_logits(params, cfg, stage, x_glob, occ_known, nbr27))


def _prep_level(params, cfg: ModelConfig, s_idx: int, coords_np: np.ndarray, n: int):
    coords, keys, code, nbr = level_arrays_from_coords(coords_np, n)
    x_glob = level_context(params, cfg, jnp.int32(s_idx), code, nbr)
    return coords, keys, nbr, x_glob


def encode_frame(params, cfg: ModelConfig, pyr: FramePyramid) -> dict:
    """Encode one frame's occupancy streams; returns
    {'blobs': [bytes per scale], 'bits': total}."""
    blobs = []
    total_bits = 0
    for s_idx, lev in enumerate(pyr.levels):
        _, _, nbr, x_glob = _prep_level(params, cfg, s_idx, lev.coords, lev.n)
        b = lev.coords.shape[0]
        occ_f = jnp.asarray(lev.occ.astype(np.float32))
        probs, bits = [], []
        occ_known = jnp.zeros((b, 0), F32)
        for stage in range(8):
            p = _stage_probs(params, cfg, stage, x_glob, occ_known, nbr)
            probs.append(np.asarray(p[: lev.n]))
            bits.append(lev.occ[: lev.n, stage])
            occ_known = jnp.concatenate([occ_known, occ_f[:, stage: stage + 1]], axis=1)
        streams = binary_encode_batch(probs, bits)
        blob = pack_bitstream(streams)
        total_bits += len(blob) * 8
        blobs.append(blob)
    return {"blobs": blobs, "bits": total_bits}


def decode_frame(params, cfg: ModelConfig, scale_blobs: list, low_coords: np.ndarray) -> np.ndarray:
    """Decode one frame coarse-to-fine from the lowest-scale coords and the
    per-scale stream blobs (decoder.py:153-176)."""
    n = len(low_coords)
    b = bucket_size(n)
    cur = np.zeros((b, 3), np.int32)
    cur[:n] = low_coords
    for s_idx in range(len(scale_blobs) - 1, -1, -1):
        coords, keys, nbr, x_glob = _prep_level(params, cfg, s_idx, cur, n)
        streams = unpack_bitstream(scale_blobs[s_idx])
        assert len(streams) == 8, "scale blob must hold 8 stage streams"
        occ_known = jnp.zeros((coords.shape[0], 0), F32)
        occ_cols = []
        for stage in range(8):
            p = _stage_probs(params, cfg, stage, x_glob, occ_known, nbr)
            decoded = binary_decode(np.asarray(p[:n]), streams[stage])
            col = np.zeros((coords.shape[0],), np.float32)
            col[:n] = decoded
            col_dev = jnp.asarray(col)
            occ_cols.append(col_dev)
            occ_known = jnp.concatenate([occ_known, col_dev[:, None]], axis=1)
        occ = jnp.stack(occ_cols, axis=1).astype(jnp.int32)
        children, ckeys, n_c = octree_up(jnp.asarray(coords), keys, occ)
        n = int(n_c)
        b = bucket_size(n)
        cur = np.zeros((b, 3), np.int32)
        cur[:n] = np.asarray(children[:n])
    return cur[:n]


# -------------------------------------------------------------- GOP enc --


def params_template(cfg: ModelConfig):
    """Shape/dtype template for deserializing weight vectors."""
    return init_params(jax.random.PRNGKey(0), cfg)


def encode_gop(
    model_path: str,
    pyramids: list[FramePyramid],
    result_dir: str,
    cfg: ModelConfig,
    logger=None,
) -> dict:
    """Encode one GOP to the on-disk artifact layout (encoder.py:57-156)."""
    from .overfit import load_checkpoint

    log = logger.info if logger is not None else print
    bins_dir = os.path.join(result_dir, "bins")
    os.makedirs(bins_dir, exist_ok=True)

    template = params_template(cfg)
    params, _, meta = load_checkpoint(model_path, template)
    bitdepth = meta.get("bitdepth", 8)

    low_bytes = encode_low_all_frames(pyramids)
    with open(os.path.join(bins_dir, "low_enc_bytes.bin"), "wb") as f:
        f.write(low_bytes)

    flat = np.asarray(flatten_params(params))
    comp = compress_params(flat, bitdepth)
    with open(os.path.join(bins_dir, "model.bin"), "wb") as f:
        f.write(comp["final_bytes"])
    with open(os.path.join(result_dir, "side_info.json"), "w") as f:
        json.dump(comp["side_info"], f, indent=4)

    # Probabilities MUST come from the dequantized weights so the decoder
    # (which only has those) predicts identically (encoder.py:101-103).
    params_used = unflatten_params(template, jnp.asarray(comp["recon"]))

    total_bits = 0
    total_points = 0
    for idx, pyr in enumerate(pyramids):
        log(f"encode frame {idx}/{len(pyramids)}")
        out = encode_frame(params_used, cfg, pyr)
        for s, blob in enumerate(out["blobs"]):
            with open(
                os.path.join(bins_dir, f"frame{idx:04d}_scale{s}.bin"), "wb"
            ) as f:
                f.write(blob)
        total_bits += out["bits"]
        total_points += pyr.point_num
    return {
        "point_bits": total_bits,
        "model_bits": comp["bit_real"],
        "low_bits": len(low_bytes) * 8,
        "points": total_points,
        "enc_mode": comp["enc_mode"],
    }


def decode_gop(
    enc_dir: str,
    dec_dir: str | None,
    cfg: ModelConfig,
    gop_start_idx: int = 0,
    ground_truth=None,
    write_flag: bool = False,
    logger=None,
) -> list:
    """Decode one GOP from its artifact directory; optionally verify
    losslessness against ground truth and write PLY files
    (decoder.py:51-146).  Returns the decoded frames (original
    coordinates)."""
    log = logger.info if logger is not None else print
    bins_dir = os.path.join(enc_dir, "bins")

    with open(os.path.join(bins_dir, "low_enc_bytes.bin"), "rb") as f:
        lows, mins = decode_low_all_frames(f.read())
    with open(os.path.join(enc_dir, "side_info.json")) as f:
        side_info = json.load(f)
    with open(os.path.join(bins_dir, "model.bin"), "rb") as f:
        model_blob = f.read()

    template = params_template(cfg)
    n_params = len(np.asarray(flatten_params(template)))
    flat = decompress_params(n_params, side_info, model_blob)
    params = unflatten_params(template, jnp.asarray(flat))

    if dec_dir is not None:
        os.makedirs(dec_dir, exist_ok=True)

    decoded = []
    for idx in range(len(lows)):
        # scale count discovered from the bin files (decoder.py:104-113)
        files = globmod.glob(os.path.join(bins_dir, f"frame{idx:04d}_scale*.bin"))
        scale_num = 1 + max(
            int(f.rsplit("scale", 1)[1].split(".bin")[0]) for f in files
        )
        blobs = []
        for s in range(scale_num):
            with open(
                os.path.join(bins_dir, f"frame{idx:04d}_scale{s}.bin"), "rb"
            ) as f:
                blobs.append(f.read())
        coords = decode_frame(params, cfg, blobs, lows[idx])
        final = coords + mins[idx]
        if ground_truth is not None:
            gt = ground_truth(idx)
            assert final.shape == gt.shape and np.array_equal(final, gt), (
                f"frame {idx} decode mismatch"
            )
            log(f"frame {idx} is correct")
        decoded.append(final)
        if write_flag and dec_dir is not None:
            real_idx = gop_start_idx + idx
            write_ply_ascii(
                os.path.join(dec_dir, f"frame{real_idx:04d}.ply"), final
            )
    return decoded
