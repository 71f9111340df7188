"""Production encode/decode pipelines (GOP-batched, traced-stage).

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

TPU-first structure (vs the reference's frame-serial, stage-serial
device<->host ping-pong):

  * ALL frames of a GOP are coded together, stage-synchronously: one
    vmapped executable evaluates stage i of scale s for every frame at
    once, and the host arithmetic coder runs all frames' streams in one
    multithreaded native call.  Device dispatches per GOP: S * 8 instead
    of F * S * 8.
  * The stage index is a traced scalar (models/network.py
    ``stage_context_traced``), so one executable per level bucket covers
    all 8 stages — compile count stays tiny.
  * Encoder/decoder symmetry: both sides run the *same* executables on the
    same GOP-padded shapes with the *dequantized* weights
    (encoder.py:101-103).  The stage context masks occupancy columns
    >= stage, so the encoder can pass full ground truth while the decoder
    passes its partially decoded buffer — the masked values coincide, so
    the f32 probability streams are bit-identical by construction.

Consequence (a deliberate codec property, like the reference's shared
per-GOP model): the GOP is the decode unit — per-level array shapes are
derived from the max level size across the GOP's frames, which the decoder
reconstructs as it decodes all frames together.
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
    binary_decode_batch,
    pack_bitstream,
    unpack_bitstream,
)
from ..coding.weights import compress_params, decompress_params
from ..data.dataset import FramePyramid, bucket_size
from ..data.ply import write_ply_ascii
from ..models import ModelConfig, flatten_params, unflatten_params, init_params
from ..models.network import (
    _block,
    _input_features,
    stage_context_traced,
    stage_head_traced,
)
from ..ops import coord_key, neighbor_feature_code, neighbor_map, octree_up

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


# ------------------------------------------------- batched level kernels --


@partial(jax.jit, static_argnames=("kernel_size", "dilations"))
def _prep_levels(coords, n_valid, kernel_size: int = 3,
                 dilations: tuple = (1,)):
    """(F, B, 3) coords + (F,) counts -> keys, feature codes, neighbor
    maps, all per frame.  ``dilations`` > (1,) stacks per-dilation maps
    along K (DilatedResNet configs, cf. ModelConfig.dilations)."""

    def one(c, n):
        valid = jnp.arange(c.shape[0]) < n
        keys = coord_key(c, valid)
        nbr_t = jnp.concatenate(
            [neighbor_map(c, keys, kernel_size, d).T for d in dilations],
            axis=0,
        )  # (D*K, B) feature-major
        return keys, neighbor_feature_code(c, keys), nbr_t

    return jax.vmap(one)(coords, n_valid)


@partial(jax.jit, static_argnames=("cfg",))
def _context_batched(params, cfg: ModelConfig, s_idx, code, nbr):
    def one(code_f, nbr_f):
        intensor = _input_features(params, cfg, s_idx * 128 + code_f)
        return _block(intensor, nbr_f, params["block_in"])  # (ch, B)

    return jax.vmap(one)(code, nbr)


@partial(jax.jit, static_argnames=("cfg",))
def _stage_probs_batched(params, cfg: ModelConfig, stage, x_glob, occ7, nbr):
    """(F, gmax, B) per-bit probabilities for ``stage``'s group (rows
    past the group's width are padding).  ``occ7`` is the
    (F, ctx_channels, B) group-perm-ordered context buffer; channels not
    yet coded before ``stage`` are masked inside the executable."""

    def one(xg, o7, nb):
        ctx = stage_context_traced(params, cfg, stage, xg, o7, nb)
        return jax.nn.sigmoid(stage_head_traced(params, cfg, stage, ctx, nb))

    return jax.vmap(one)(x_glob, occ7, nbr)


@jax.jit
def _upsample_batched(coords, keys, occ):
    def one(c, k, o):
        children, ckeys, n_c = octree_up(c, k, o)
        return children, n_c

    return jax.vmap(one)(coords, keys, occ)


def _pad_level_coords(level_coords: list[np.ndarray], ns: list[int]):
    b = bucket_size(max(ns)) if ns else 1024
    f = len(level_coords)
    out = np.zeros((f, b, 3), np.int32)
    for i, (c, n) in enumerate(zip(level_coords, ns)):
        out[i, :n] = c[:n]
    return out, b


# -------------------------------------------------------------- encoding --


def _use_sb(cfg: ModelConfig) -> bool:
    """The superbrick codec path covers the default architecture; other
    kernel sizes — and DilatedResNet, whose d=2 convs need a second
    neighbor map the brick layouts don't carry — run the flat gather
    path.  Encode and decode dispatch on the same predicate, so a
    bitstream is always decoded by the backend that produced it (the f32
    probability bits are backend-specific — the same same-numerics
    constraint the reference has between its CUDA encoder and decoder)."""
    return (
        cfg.kernel_size == 3
        and cfg.outstage == 8
        and cfg.block_type != "dilation"
    )


def encode_gop_streams(params, cfg: ModelConfig, pyramids: list[FramePyramid]):
    """Occupancy streams for every (frame, scale) of a GOP, coded
    stage-synchronously across frames.  Returns blobs[frame][scale]."""
    if _use_sb(cfg):
        from .dev_codec import (
            _rans_mode,
            encode_gop_streams_dev,
            encode_gop_streams_rans,
        )

        if _rans_mode(cfg):
            # device entropy coder: wire is {"rans": [chunk blobs]}
            return encode_gop_streams_rans(params, cfg, pyramids)
        return encode_gop_streams_dev(params, cfg, pyramids)
    return encode_gop_streams_gather(params, cfg, pyramids)


def encode_gop_streams_sb(params, cfg: ModelConfig, pyramids):
    """Brick-layout encode: per level, one x_glob call + 8 per-stage
    device calls (the decoder's exact executables) cover a sub-batch of
    frames; the host AC codes all streams in one batch."""
    from .sb_codec import build_codec_level, encode_level_probs, _frame_chunks

    f = len(pyramids)
    s_num = pyramids[0].scale_num
    blobs = [[None] * s_num for _ in range(f)]
    total_bits = 0
    for s in range(s_num):
        probs = [[None] * f for _ in range(cfg.outstage)]
        bits = [[None] * f for _ in range(cfg.outstage)]
        for chunk in _frame_chunks(f):
            level = build_codec_level(
                [pyramids[i].levels[s].coords[: pyramids[i].levels[s].n] for i in chunk],
                s,
                [pyramids[i].levels[s].occ[: pyramids[i].levels[s].n] for i in chunk],
            )
            c_probs, c_bits = encode_level_probs(params, cfg, level)
            for stage in range(cfg.outstage):
                for j, i in enumerate(chunk):
                    probs[stage][i] = c_probs[stage][j]
                    bits[stage][i] = c_bits[stage][j]
        flat_probs = [p for stage in probs for p in stage]
        flat_bits = [b for stage in bits for b in stage]
        streams = binary_encode_batch(flat_probs, flat_bits)
        for i in range(f):
            per_frame = [streams[stage * f + i] for stage in range(cfg.outstage)]
            blob = pack_bitstream(per_frame)
            blobs[i][s] = blob
            total_bits += len(blob) * 8
    return blobs, total_bits


def encode_gop_streams_gather(params, cfg: ModelConfig, pyramids):
    """Flat per-voxel gather encode (kernel_size != 3 variants)."""
    f = len(pyramids)
    s_num = pyramids[0].scale_num
    blobs = [[None] * s_num for _ in range(f)]
    total_bits = 0
    for s in range(s_num):
        ns = [p.levels[s].n for p in pyramids]
        coords_np, b = _pad_level_coords([p.levels[s].coords for p in pyramids], ns)
        coords = jnp.asarray(coords_np)
        n_dev = jnp.asarray(ns, jnp.int32)
        keys, code, nbr = _prep_levels(coords, n_dev, cfg.kernel_size, cfg.dilations)
        x_glob = _context_batched(params, cfg, jnp.int32(s), code, nbr)
        occ_np = np.zeros((f, b, 8), np.float32)
        for i, p in enumerate(pyramids):
            occ_np[i, : ns[i]] = p.levels[s].occ[: ns[i]]
        # feature-major context buffer in group-perm octant order
        perm = np.asarray(cfg.group_perm)
        occ_ctx = jnp.asarray(
            occ_np.transpose(0, 2, 1)[:, perm, :][:, : cfg.ctx_channels, :]
        )

        # one AC stream per OCTANT BIT (8 per frame at any grouping):
        # stage g's group bits share one probability evaluation and are
        # conditionally independent given the context (upsample.py:149-160)
        probs_all, bits_all = [], []
        pos = 0
        for g, grp in enumerate(cfg.groups):
            pr = np.asarray(
                _stage_probs_batched(params, cfg, jnp.int32(g), x_glob, occ_ctx, nbr)
            )
            for j, o in enumerate(grp):
                for i in range(f):
                    probs_all.append(pr[i, j, : ns[i]])
                    bits_all.append(occ_np[i, : ns[i], o])
            pos += len(grp)
        streams = binary_encode_batch(probs_all, bits_all)
        # streams are ordered bit-major; regroup per frame
        for i in range(f):
            per_frame = [streams[k * f + i] for k in range(8)]
            blob = pack_bitstream(per_frame)
            blobs[i][s] = blob
            total_bits += len(blob) * 8
    return blobs, total_bits


def encode_frame(params, cfg: ModelConfig, pyr: FramePyramid) -> dict:
    """Single-frame encode (a GOP of one).  Note: streams are only
    decodable with the same frame grouping (GOP of one)."""
    blobs, bits = encode_gop_streams(params, cfg, [pyr])
    if isinstance(blobs, dict) and "rans" in blobs:
        return {"blobs": blobs, "bits": bits}
    return {"blobs": blobs[0], "bits": bits}


# -------------------------------------------------------------- decoding --


def decode_gop_streams(
    params, cfg: ModelConfig, frame_blobs: list, lows: list[np.ndarray],
    probs_mode=None, fused_budget_gb=None, fused_cs_cap=None,
):
    """Decode all frames of a GOP coarse-to-fine, stage-synchronous.

    frame_blobs[frame][scale] are the per-scale stream blobs; ``lows`` the
    base-layer coords.  Returns the decoded (min-subtracted) coordinate
    arrays, one per frame.
    """
    if isinstance(frame_blobs, dict) and "rans" in frame_blobs:
        from .dev_codec import decode_gop_streams_rans

        return decode_gop_streams_rans(
            params, cfg, frame_blobs, lows, probs_mode=probs_mode,
            fused_budget_gb=fused_budget_gb, fused_cs_cap=fused_cs_cap,
        )
    if _use_sb(cfg):
        from .dev_codec import decode_gop_streams_dev

        return decode_gop_streams_dev(
            params, cfg, frame_blobs, lows, probs_mode=probs_mode,
            fused_budget_gb=fused_budget_gb, fused_cs_cap=fused_cs_cap,
        )
    return decode_gop_streams_gather(params, cfg, frame_blobs, lows)


def decode_gop_streams_sb(params, cfg: ModelConfig, frame_blobs, lows):
    """Brick-layout decode: geometry rebuilt host-side per level from the
    coordinates decoded so far; 8 stage-synchronous device calls per
    (level, frame sub-batch) — the same deterministic sub-batching as the
    encoder, so both sides run identical executables."""
    from .sb_codec import (
        build_codec_level,
        decode_level,
        np_octree_up,
        _frame_chunks,
    )

    f = len(lows)
    s_num = len(frame_blobs[0])
    cur = [np.ascontiguousarray(low, np.int32) for low in lows]
    for s in range(s_num - 1, -1, -1):
        occs = [None] * f
        for chunk in _frame_chunks(f):
            level = build_codec_level([cur[i] for i in chunk], s)
            streams = [unpack_bitstream(frame_blobs[i][s]) for i in chunk]
            c_occs = decode_level(params, cfg, level, streams)
            for j, i in enumerate(chunk):
                occs[i] = c_occs[j]
        cur = [np_octree_up(cur[i], occs[i]) for i in range(f)]
    return cur


def decode_gop_streams_gather(params, cfg: ModelConfig, frame_blobs, lows):
    """Flat per-voxel gather decode (kernel_size != 3 variants)."""
    f = len(lows)
    s_num = len(frame_blobs[0])
    ns = [len(low) for low in lows]
    cur_np, b = _pad_level_coords(lows, ns)
    for s in range(s_num - 1, -1, -1):
        coords = jnp.asarray(cur_np)
        n_dev = jnp.asarray(ns, jnp.int32)
        keys, code, nbr = _prep_levels(coords, n_dev, cfg.kernel_size, cfg.dilations)
        x_glob = _context_batched(params, cfg, jnp.int32(s), code, nbr)
        streams = [unpack_bitstream(frame_blobs[i][s]) for i in range(f)]
        occ_ctx = jnp.zeros((f, cfg.ctx_channels, coords.shape[1]), F32)
        occ_cols = [None] * 8  # octant order
        pos = 0  # bit-stream index AND group-perm channel index
        for g, grp in enumerate(cfg.groups):
            pr = np.asarray(
                _stage_probs_batched(params, cfg, jnp.int32(g), x_glob, occ_ctx, nbr)
            )
            # the group's bits decode against ONE probability evaluation
            # (conditionally independent given the context)
            decs = binary_decode_batch(
                [pr[i, j, : ns[i]] for j in range(len(grp)) for i in range(f)],
                [streams[i][pos + j] for j in range(len(grp)) for i in range(f)],
            )
            for j, o in enumerate(grp):
                col = np.zeros((f, coords.shape[1]), np.float32)
                for i in range(f):
                    col[i, : ns[i]] = decs[j * f + i]
                col_dev = jnp.asarray(col)
                occ_cols[o] = col_dev
                if pos + j < cfg.ctx_channels:
                    occ_ctx = occ_ctx.at[:, pos + j, :].set(col_dev)
            pos += len(grp)
        occ = jnp.stack(occ_cols, axis=-1).astype(jnp.int32)
        children, counts = _upsample_batched(coords, keys, occ)
        ns = [int(c) for c in np.asarray(counts)]
        b = bucket_size(max(ns))
        children_np = np.asarray(children)
        cur_np = np.zeros((f, b, 3), np.int32)
        for i in range(f):
            take = min(b, children_np.shape[1])
            cur_np[i, : min(ns[i], take)] = children_np[i, : min(ns[i], take)]
    return [cur_np[i, : ns[i]] for i in range(f)]


def decode_frame(params, cfg: ModelConfig, scale_blobs, low_coords: np.ndarray):
    """Single-frame decode (GOP of one; see encode_frame)."""
    if isinstance(scale_blobs, dict) and "rans" in scale_blobs:
        return decode_gop_streams(params, cfg, scale_blobs, [low_coords])[0]
    return decode_gop_streams(params, cfg, [scale_blobs], [low_coords])[0]


# ----------------------------------------------------------- GOP on disk --


def params_template(cfg: ModelConfig):
    """Shape/dtype template for deserializing weight vectors."""
    return init_params(jax.random.PRNGKey(0), cfg)


# Model-architecture side info: lets a decoder reconstruct the network from
# the bitstream directory alone (the reference instead hard-codes the
# architecture at every entry point and globs scale_num from bin filenames,
# decoder.py:104-113,189).  Costed like the reference costs its side info
# (modeled bits, stored as JSON): one byte per small-int field.
_CFG_FIELDS = (
    "scale_num",
    "in_channel",
    "hidden_channel_conv",
    "hidden_channel_mlp",
    "embed_dim",
    "scale_mlp_hidden",
    "block_layers",
    "outstage",
    "kernel_size",
)
# block_type is a string on ModelConfig; it crosses the side info as a
# small enum int (a resnet-core model must NOT reconstruct as inception:
# the parameter counts differ and standalone decode would mis-assign
# every weight).
_BLOCK_TYPES = ("inception", "resnet", "dilation")
CFG_SIDE_BITS = 8 * (len(_CFG_FIELDS) + 1)


def cfg_side_info(cfg: ModelConfig) -> dict:
    info = {k: int(getattr(cfg, k)) for k in _CFG_FIELDS}
    info["block_type"] = _BLOCK_TYPES.index(cfg.block_type)
    return info


def cfg_from_side_info(side_info: dict) -> ModelConfig:
    info = side_info["model_cfg"]
    kw = {k: int(info[k]) for k in _CFG_FIELDS}
    # block_type entered the side info after round 2; default to the only
    # value older bitstreams could have carried
    kw["block_type"] = _BLOCK_TYPES[int(info.get("block_type", 0))]
    return ModelConfig(**kw)


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
    side_info = dict(
        comp["side_info"],
        model_cfg=cfg_side_info(cfg),
        # integrity: streams are only decodable with the GOP grouping
        # they were encoded with (shapes/probabilities are GOP-derived);
        # a grouping mismatch must fail loudly, not corrupt silently
        # (costed at 32 bits/frame below)
        frame_points=[int(p.point_num) for p in pyramids],
        # bit-exactness discipline (docs/DESIGN.md): the probability
        # producer must be the SAME executable on both codec sides, so
        # the numerics knobs that select it travel with the bitstream
        numerics=_numerics_info(),
    )
    with open(os.path.join(result_dir, "side_info.json"), "w") as f:
        json.dump(side_info, f, indent=4)

    # Probabilities MUST come from the dequantized weights so the decoder
    # (which only has those) predicts identically (encoder.py:101-103).
    params_used = unflatten_params(template, jnp.asarray(comp["recon"]))

    log(f"encode GOP: {len(pyramids)} frames")
    blobs, total_bits = encode_gop_streams(params_used, cfg, pyramids)
    if isinstance(blobs, dict) and "rans" in blobs:
        # v2 = v1 segment layout + a CRC32 of the lane streams in the blob
        # header (ops/rans.py pack_rans_blob); the unpacker reads both
        side_info["entropy"] = "rans-v2"
        with open(os.path.join(result_dir, "side_info.json"), "w") as f:
            json.dump(side_info, f, indent=4)
        for k, blob in enumerate(blobs["rans"]):
            with open(
                os.path.join(bins_dir, f"chunk{k:04d}.rans"), "wb"
            ) as f:
                f.write(blob)
    else:
        for idx in range(len(pyramids)):
            for s, blob in enumerate(blobs[idx]):
                with open(
                    os.path.join(bins_dir, f"frame{idx:04d}_scale{s}.bin"),
                    "wb",
                ) as f:
                    f.write(blob)
    return {
        "point_bits": total_bits,
        "model_bits": comp["bit_real"] + CFG_SIDE_BITS + 32 * len(pyramids),
        "low_bits": len(low_bytes) * 8,
        "points": sum(p.point_num for p in pyramids),
        "enc_mode": comp["enc_mode"],
    }


def _numerics_info() -> dict:
    """The knobs that select the probability-producer executable: the
    codec compute dtype, the conv kernel implementation, and the probs
    executable shape ("fused" cs=8 vs "stage" cs=1 — differently-shaped
    programs are not bitwise-interchangeable).  Recorded in side_info at
    encode; the decoder must match dtype/kernel exactly or the
    arithmetic/rANS decode diverges (same discipline as CUDA numerics on
    both sides in the reference).  The probs mode is ADOPTED by the
    decoder rather than enforced (decode_gop passes it down)."""
    from ..ops.superbricks import _conv_kernel_mode, _halo_mode
    from .dev_codec import CDT, _fused_budget_gb, _fused_cs_cap, _probs_mode

    info = {
        "dtype": "f32" if CDT == jnp.float32 else "bf16",
        "conv_kernel": _conv_kernel_mode(),
        "halo": _halo_mode(),
        "probs": _probs_mode(),
    }
    if info["probs"] == "fused":
        # the per-level stage-batch width cs derives from (shapes, this
        # budget, this latency cap); the decoder adopts the encoder's
        # values so both sides pick identical executables even if their
        # env configs differ
        info["fused_budget_gb"] = _fused_budget_gb()
        info["fused_cs_cap"] = _fused_cs_cap()
    return info


def decode_gop(
    enc_dir: str,
    dec_dir: str | None,
    cfg: ModelConfig | None = None,
    gop_start_idx: int = 0,
    ground_truth=None,
    write_flag: bool = False,
    logger=None,
) -> list:
    """Decode one GOP from its artifact directory; optionally verify
    losslessness against ground truth and write PLY files
    (decoder.py:51-146).

    Standalone: with ``cfg=None`` the model architecture is reconstructed
    from ``side_info.json`` — the bins directory alone suffices, matching
    the reference decoder's independence (/root/reference/decoder.py:16-150
    runs from the bitstream directory without the original dataset).
    """
    log = logger.info if logger is not None else print
    bins_dir = os.path.join(enc_dir, "bins")

    with open(os.path.join(bins_dir, "low_enc_bytes.bin"), "rb") as f:
        lows, mins = decode_low_all_frames(f.read())
    with open(os.path.join(enc_dir, "side_info.json")) as f:
        side_info = json.load(f)
    with open(os.path.join(bins_dir, "model.bin"), "rb") as f:
        model_blob = f.read()

    if cfg is None:
        cfg = cfg_from_side_info(side_info)

    enc_num = side_info.get("numerics")
    probs_mode = None
    fused_budget_gb = None
    fused_cs_cap = None
    if enc_num is not None and _use_sb(cfg):
        enc_num = dict(enc_num)
        # the probs executable shape travels with the bitstream and the
        # decoder simply adopts it (pre-round-4 side_info carries no
        # "probs" key: those streams were stage-serial), as do the
        # fused-cs HBM budget and latency cap it was derived under
        # (pre-cap fused streams ran uncapped: cap=8)
        probs_mode = enc_num.pop("probs", "stage")
        # pre-round-5 streams predate the axis-separated halo: their
        # executables used the 26-fragment layout
        enc_num.setdefault("halo", "flat")
        fused_budget_gb = enc_num.pop("fused_budget_gb", None)
        fused_cs_cap = enc_num.pop("fused_cs_cap", 8)
        dec_num = {
            k: v
            for k, v in _numerics_info().items()
            if k not in ("probs", "fused_budget_gb", "fused_cs_cap")
        }
        if dec_num != enc_num:
            raise ValueError(
                f"decoder numerics {dec_num} do not match the encoder's "
                f"{enc_num}: the probability executables would differ and "
                "the entropy decode diverges.  Set LINR_CODEC_DTYPE / "
                "LINR_CONV_KERNEL / LINR_HALO to the encoder's values."
            )

    template = params_template(cfg)
    n_params = len(np.asarray(flatten_params(template)))
    flat = decompress_params(n_params, side_info, model_blob)
    params = unflatten_params(template, jnp.asarray(flat))

    if side_info.get("entropy") in ("rans-v1", "rans-v2"):
        chunk_files = sorted(
            globmod.glob(os.path.join(bins_dir, "chunk*.rans"))
        )
        frame_blobs = {"rans": [], "s_num": cfg.scale_num}
        for fn in chunk_files:
            with open(fn, "rb") as fh:
                frame_blobs["rans"].append(fh.read())
    else:
        frame_blobs = []
        for idx in range(len(lows)):
            # scale count discovered from the bin files (decoder.py:104-113)
            files = globmod.glob(
                os.path.join(bins_dir, f"frame{idx:04d}_scale*.bin")
            )
            scale_num = 1 + max(
                int(fn.rsplit("scale", 1)[1].split(".bin")[0]) for fn in files
            )
            blobs = []
            for s in range(scale_num):
                with open(
                    os.path.join(bins_dir, f"frame{idx:04d}_scale{s}.bin"),
                    "rb",
                ) as fh:
                    blobs.append(fh.read())
            frame_blobs.append(blobs)

    if dec_dir is not None:
        os.makedirs(dec_dir, exist_ok=True)

    coords_list = decode_gop_streams(
        params, cfg, frame_blobs, lows, probs_mode=probs_mode,
        fused_budget_gb=fused_budget_gb, fused_cs_cap=fused_cs_cap,
    )
    expect = side_info.get("frame_points")
    if expect is not None:
        got = [len(c) for c in coords_list]
        if got != list(expect):
            raise ValueError(
                "decoded point counts do not match the encoder's "
                f"(expected {expect}, got {got}) — the bitstream was "
                "decoded with a different GOP grouping or is corrupt"
            )
    decoded = []
    for idx, coords in enumerate(coords_list):
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
