"""Mid-training evaluation: real-rate measurement of a GOP checkpoint.

The reference's ``Test_one_gop`` (test_utils.py:16-163): load the
checkpoint, run the weight-codec roundtrip, per frame run a real
arithmetic encode + decode with asserts, and report

    bpp_all = point_bpp + model_bpp + xyzlow_bpp

plus per-frame enc/dec times, written to ``result.json``.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax.numpy as jnp

from ..coding import binary_decode_batch, unpack_bitstream, binary_estimate_bits
from ..coding.weights import compress_params, decompress_params
from ..models import ModelConfig, flatten_params, unflatten_params


def test_one_gop(
    model_path: str,
    cfg: ModelConfig,
    pyramids: list,
    result_dir: str,
    write_flag: bool = False,
    low_bytes: bytes | None = None,
    logger=None,
) -> dict:
    from .codec import encode_frame, params_template
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
    side_info = dict(comp["side_info"])
    with open(os.path.join(result_dir, "side_info.json"), "w") as f:
        json.dump(side_info, f, indent=4)

    bits_real = 0
    bits_est = 0.0
    points = 0
    for idx, pyr in enumerate(pyramids):
        st = time.time()
        out = encode_frame(params_used, cfg, pyr)
        t_enc = time.time() - st
        # real AC decode roundtrip per stream (model_core.py:170-227's
        # encode+decode+assert, done batched)
        st = time.time()
        probs_all, bits_all, streams_all = [], [], []
        for s_idx, (lev, blob) in enumerate(zip(pyr.levels, out["blobs"])):
            streams = unpack_bitstream(blob)
            p_out = _frame_probs(params_used, cfg, s_idx, lev)
            for stage in range(8):
                probs_all.append(p_out[stage])
                bits_all.append(lev.occ[: lev.n, stage])
                streams_all.append(streams[stage])
        decs = binary_decode_batch(probs_all, streams_all)
        t_dec = time.time() - st
        for d, gt in zip(decs, bits_all):
            assert np.array_equal(d, gt.astype(np.uint8)), "AC roundtrip failed"
        bits_est += sum(
            binary_estimate_bits(p, bvec) for p, bvec in zip(probs_all, bits_all)
        )
        bits_real += out["bits"]
        points += pyr.point_num
        enc_time += t_enc
        dec_time += t_enc + t_dec  # decode re-runs the network, like the ref
        if write_flag:
            for s, blob in enumerate(out["blobs"]):
                with open(
                    os.path.join(bins_dir, f"frame{idx:04d}_scale{s}.bin"), "wb"
                ) as f:
                    f.write(blob)

    low_bits = len(low_bytes) * 8 if low_bytes is not None else 0
    result = {
        "bpp_all": bits_real / points + comp["bit_real"] / points + low_bits / points,
        "point_bpp": bits_real / points,
        "point_bpp_val": bits_est / points,
        "model_bpp": comp["bit_real"] / points,
        "xyzlow_bpp": low_bits / points,
        "enc_mode": comp["enc_mode"],
        "enc_time": enc_time / len(pyramids),
        "dec_time": dec_time / len(pyramids),
    }
    with open(os.path.join(result_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=4)
    return result


def _frame_probs(params, cfg: ModelConfig, s_idx: int, lev):
    """Per-stage probability arrays for one level (ground-truth context)."""
    from .codec import _prep_level, _stage_probs

    _, _, nbr, x_glob = _prep_level(params, cfg, s_idx, lev.coords, lev.n)
    occ_f = jnp.asarray(lev.occ.astype(np.float32))
    out = []
    occ_known = jnp.zeros((lev.coords.shape[0], 0), jnp.float32)
    for stage in range(8):
        p = _stage_probs(params, cfg, stage, x_glob, occ_known, nbr)
        out.append(np.asarray(p[: lev.n]))
        occ_known = jnp.concatenate([occ_known, occ_f[:, stage: stage + 1]], axis=1)
    return out
