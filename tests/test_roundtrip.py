"""End-to-end codec tests: weight codec, training step, full lossless
encode->decode roundtrip on synthetic clouds (CPU).

This is the rebuild of the reference's ultimate correctness check — the
decoder-side losslessness assert (decoder.py:140) — as a repeatable test.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linr_pcgc_tpu.coding.weights import (
    compress_params,
    decompress_params,
    estimate_bits,
)
from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
from linr_pcgc_tpu.models import ModelConfig, init_params, flatten_params
from linr_pcgc_tpu.runtime import (
    TrainConfig,
    assemble_gop,
    adam_init,
    make_epoch_fn,
    save_checkpoint,
    load_checkpoint,
    encode_gop,
    decode_gop,
    encode_frame,
    decode_frame,
)
from linr_pcgc_tpu.runtime.overfit import batch_arrays
from linr_pcgc_tpu.runtime.codec import (
    encode_low_all_frames,
    decode_low_all_frames,
    params_template,
)


def small_dataset(n_frames=2, n_pts=2500, depth=7, scale_num=None):
    frames = [synthetic_cloud(n_pts, depth=depth, seed=s) for s in range(n_frames)]
    ds = PyramidDataset(frames, handle_dir=None, scale_num=scale_num)
    ds[0]  # derive scale_num from frame 0, as the reference does (main.py:77)
    return ds, frames


def test_weight_codec_roundtrip_all_modes():
    rng = np.random.default_rng(0)
    # laplace-friendly vector (mode 2)
    flat = rng.laplace(0.0, 0.05, 54712).astype(np.float32)
    comp = compress_params(flat, 8)
    recon = decompress_params(len(flat), comp["side_info"], comp["final_bytes"])
    np.testing.assert_array_equal(recon, comp["recon"])
    assert comp["enc_mode"] == 2
    assert comp["bpp_real"] < 8
    # near-uniform vector: AC can't beat zlib/raw -> falls back
    flat_u = rng.uniform(-1, 1, 5000).astype(np.float32)
    comp_u = compress_params(flat_u, 8)
    recon_u = decompress_params(len(flat_u), comp_u["side_info"], comp_u["final_bytes"])
    np.testing.assert_array_equal(recon_u, comp_u["recon"])
    assert comp_u["enc_mode"] in (0, 1)
    # estimate path agrees with the real path's reconstruction
    est = estimate_bits(flat, 8)
    np.testing.assert_array_equal(est["recon"], comp["recon"])


def test_weight_codec_constant_params():
    flat = np.full(1000, 0.25, np.float32)
    comp = compress_params(flat, 8)
    recon = decompress_params(1000, comp["side_info"], comp["final_bytes"])
    np.testing.assert_array_equal(recon, comp["recon"])


def test_base_layer_roundtrip():
    ds, frames = small_dataset(3)
    pyrs = [ds[i] for i in range(3)]
    blob = encode_low_all_frames(pyrs)
    lows, mins = decode_low_all_frames(blob)
    assert len(lows) == 3
    for pyr, low, mn in zip(pyrs, lows, mins):
        np.testing.assert_array_equal(low, pyr.low_coords)
        np.testing.assert_array_equal(mn, pyr.coord_min)


def test_training_reduces_loss():
    ds, _ = small_dataset(2, n_pts=2000)
    pyrs = [ds[0], ds[1]]
    cfg = ModelConfig(scale_num=ds.scale_num)
    tc = TrainConfig()
    batch = assemble_gop(pyrs)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = adam_init(params)
    epoch_fn = make_epoch_fn(cfg, tc)
    lr = jnp.asarray(tc.learning_rate, jnp.float32)
    k = jnp.zeros((), jnp.int32)
    arrays = batch_arrays(batch)
    losses0 = None
    for _ in range(6):
        params, opt, lr, k, losses = epoch_fn(params, opt, lr, k, arrays)
        if losses0 is None:
            losses0 = float(np.mean(np.asarray(losses)))
    lossN = float(np.mean(np.asarray(losses)))
    assert lossN < losses0 * 0.8, (losses0, lossN)
    assert int(opt["t"]) == 12  # one Adam step per frame per epoch


def test_lr_schedule_semantics():
    """lr decays by gamma every step_size optimizer steps; min_lr clamp at
    epoch end."""
    ds, _ = small_dataset(2, n_pts=800)
    cfg = ModelConfig(scale_num=ds.scale_num)
    tc = TrainConfig(step_size=2, gamma=0.5, min_lr=0.004, learning_rate=0.01)
    batch = assemble_gop([ds[0], ds[1]])
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = adam_init(params)
    epoch_fn = make_epoch_fn(cfg, tc)
    lr = jnp.asarray(tc.learning_rate, jnp.float32)
    k = jnp.zeros((), jnp.int32)
    arrays = batch_arrays(batch)
    # epoch = 2 frames = 2 steps -> one decay 0.01 -> 0.005 (above clamp)
    params, opt, lr, k, _ = epoch_fn(params, opt, lr, k, arrays)
    assert np.isclose(float(lr), 0.005)
    # next epoch: decay to 0.0025 then clamped to 0.004 at epoch end
    params, opt, lr, k, _ = epoch_fn(params, opt, lr, k, arrays)
    assert np.isclose(float(lr), 0.004)


def test_checkpoint_roundtrip(tmp_path):
    cfg = ModelConfig(scale_num=5)
    params = init_params(jax.random.PRNGKey(1), cfg)
    opt = adam_init(params)
    opt["t"] = jnp.asarray(17, jnp.int32)
    path = str(tmp_path / "model.npz")
    save_checkpoint(path, params, opt, lr=0.007, epoch=3, loss=0.5, bitdepth=8)
    p2, o2, meta = load_checkpoint(path, params)
    np.testing.assert_array_equal(
        np.asarray(flatten_params(params)), np.asarray(flatten_params(p2))
    )
    assert int(o2["t"]) == 17
    assert meta["lr"] == pytest.approx(0.007)
    assert meta["bitdepth"] == 8


def test_frame_codec_lossless_untrained():
    """encode_frame -> decode_frame must be lossless even with random
    (untrained) weights — correctness never depends on model quality."""
    ds, frames = small_dataset(1, n_pts=3000)
    pyr = ds[0]
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(3), cfg)
    out = encode_frame(params, cfg, pyr)
    rec = decode_frame(params, cfg, out["blobs"], pyr.low_coords)
    gt = np.unique(frames[0] - frames[0].min(axis=0), axis=0)
    np.testing.assert_array_equal(rec, gt)


def test_full_gop_pipeline_lossless(tmp_path):
    """The whole thing: overfit a tiny GOP briefly, encode to disk, decode
    from disk, assert losslessness against the original frames."""
    from linr_pcgc_tpu.runtime import overfit_gop

    ds, frames = small_dataset(2, n_pts=2000)
    cfg = ModelConfig(scale_num=ds.scale_num)
    tc = TrainConfig()
    result_dir = str(tmp_path / "out")
    model_path = overfit_gop(
        dataset=ds,
        group_range=range(0, 2),
        epoch_num=2,
        cfg=cfg,
        tc=tc,
        result_dir=result_dir,
        handle_dir=str(tmp_path / "tmp"),
    )
    assert os.path.exists(model_path)
    assert os.path.exists(os.path.join(result_dir, "gop_0_1", "result.json"))

    enc_dir = str(tmp_path / "enc" / "gop_0_1")
    pyrs = [ds[0], ds[1]]
    stats = encode_gop(model_path, pyrs, enc_dir, cfg)
    assert stats["points"] == sum(p.point_num for p in pyrs)

    dec_dir = str(tmp_path / "dec")
    gt = lambda i: np.unique(frames[i], axis=0)
    decoded = decode_gop(
        enc_dir, dec_dir, cfg, ground_truth=gt, write_flag=True
    )
    assert len(decoded) == 2
    # PLY outputs written
    assert os.path.exists(os.path.join(dec_dir, "frame0000.ply"))
    from linr_pcgc_tpu.data import read_ply

    np.testing.assert_array_equal(
        read_ply(os.path.join(dec_dir, "frame0001.ply")), gt(1)
    )


def test_sb_codec_host_geometry_matches_device():
    """The sb codec rebuilds geometry host-side; it must agree with the
    device pipeline that produced the pyramid: feature codes per level and
    the upsample between levels are integer-exact matches."""
    from linr_pcgc_tpu.runtime.sb_codec import np_feat_code, np_octree_up

    ds, _ = small_dataset(1, n_pts=2200)
    pyr = ds[0]
    for s in range(pyr.scale_num):
        lev = pyr.levels[s]
        np.testing.assert_array_equal(
            np_feat_code(lev.coords[: lev.n]), lev.feat_code[: lev.n]
        )
        if s > 0:
            finer = pyr.levels[s - 1]
            np.testing.assert_array_equal(
                np_octree_up(lev.coords[: lev.n], lev.occ[: lev.n]),
                finer.coords[: finer.n],
            )


def test_gather_codec_backend_lossless():
    """The flat gather codec path (kernel_size != 3 dispatch) stays
    correct: force it explicitly on a default-config model."""
    from linr_pcgc_tpu.runtime.codec import (
        encode_gop_streams_gather,
        decode_gop_streams_gather,
    )

    ds, frames = small_dataset(2, n_pts=1500)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(4), cfg)
    pyrs = [ds[0], ds[1]]
    blobs, _ = encode_gop_streams_gather(params, cfg, pyrs)
    decoded = decode_gop_streams_gather(
        params, cfg, blobs, [p.low_coords for p in pyrs]
    )
    for i, dec in enumerate(decoded):
        np.testing.assert_array_equal(
            dec, np.unique(frames[i] - frames[i].min(axis=0), axis=0)
        )


def test_standalone_decode_from_bins_alone(tmp_path):
    """Decode needs only the bitstream directory: the model architecture is
    reconstructed from side_info.json (cfg=None), no dataset, no ground
    truth — the reference decoder's independence (decoder.py:16-150)."""
    ds, frames = small_dataset(2, n_pts=1500)
    cfg = ModelConfig(
        scale_num=ds.scale_num, hidden_channel_conv=8, kernel_size=3
    )
    params = init_params(jax.random.PRNGKey(5), cfg)
    from linr_pcgc_tpu.runtime.overfit import adam_init as _ai, save_checkpoint

    model_path = str(tmp_path / "model.npz")
    save_checkpoint(model_path, params, _ai(params), 0.01, 0, 1.0, 8)
    enc_dir = str(tmp_path / "enc" / "gop_0_1")
    pyrs = [ds[0], ds[1]]
    encode_gop(model_path, pyrs, enc_dir, cfg)

    import json

    with open(os.path.join(enc_dir, "side_info.json")) as f:
        side = json.load(f)
    assert side["model_cfg"]["scale_num"] == ds.scale_num

    decoded = decode_gop(enc_dir, str(tmp_path / "dec"), cfg=None,
                         write_flag=True)
    for i, dec in enumerate(decoded):
        np.testing.assert_array_equal(dec, np.unique(frames[i], axis=0))

    # the CLI path: decode-only with no ori_dir present
    from linr_pcgc_tpu import cli

    cli.main(
        [
            "--decode", "True", "--overfit", "False", "--encode", "False",
            "--ori_dir", str(tmp_path / "missing"),
            "--encode_dir", str(tmp_path / "enc"),
            "--decode_dir", str(tmp_path / "dec_cli"),
            "--result_dir", str(tmp_path / "out_cli"),
        ]
    )
    from linr_pcgc_tpu.data import read_ply

    np.testing.assert_array_equal(
        read_ply(str(tmp_path / "dec_cli" / "frame0001.ply")),
        np.unique(frames[1], axis=0),
    )


def test_grouping_mismatch_fails_loudly(tmp_path):
    """Streams are only decodable with the GOP grouping they were encoded
    with; a mismatch must raise, not silently corrupt (the decoder checks
    decoded point counts against the encoder's side info)."""
    import json

    ds, frames = small_dataset(2, n_pts=1200)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(6), cfg)
    from linr_pcgc_tpu.runtime.overfit import adam_init as _ai, save_checkpoint

    model_path = str(tmp_path / "model.npz")
    save_checkpoint(model_path, params, _ai(params), 0.01, 0, 1.0, 8)
    enc_dir = str(tmp_path / "enc" / "gop_0_1")
    encode_gop(model_path, [ds[0], ds[1]], enc_dir, cfg)

    side_path = os.path.join(enc_dir, "side_info.json")
    with open(side_path) as f:
        side = json.load(f)
    assert side["frame_points"] == [ds[0].point_num, ds[1].point_num]
    side["frame_points"] = [side["frame_points"][0] + 7,
                            side["frame_points"][1]]
    with open(side_path, "w") as f:
        json.dump(side, f)
    with pytest.raises(ValueError, match="grouping"):
        decode_gop(enc_dir, None, cfg=None)


def test_numerics_mismatch_fails_loudly(tmp_path, monkeypatch):
    """The codec dtype / conv-kernel knobs select the probability
    executable; side_info records them at encode and a decoder running
    different numerics must refuse (probabilities would diverge) rather
    than emit garbage."""
    import json

    ds, frames = small_dataset(1, n_pts=1000)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(8), cfg)
    from linr_pcgc_tpu.runtime.overfit import adam_init as _ai, save_checkpoint

    model_path = str(tmp_path / "model.npz")
    save_checkpoint(model_path, params, _ai(params), 0.01, 0, 1.0, 8)
    enc_dir = str(tmp_path / "enc" / "gop_0_0")
    monkeypatch.delenv("LINR_CONV_KERNEL", raising=False)
    encode_gop(model_path, [ds[0]], enc_dir, cfg)

    with open(os.path.join(enc_dir, "side_info.json")) as f:
        side = json.load(f)
    assert side["numerics"]["conv_kernel"] == "xla"

    monkeypatch.setenv("LINR_CONV_KERNEL", "pallas")
    with pytest.raises(ValueError, match="numerics"):
        decode_gop(enc_dir, None, cfg=None)


def test_overfit_resume(tmp_path):
    """Interrupted GOP training continues from its own checkpoint."""
    from linr_pcgc_tpu.runtime import overfit_gop
    from linr_pcgc_tpu.runtime.overfit import load_checkpoint
    from linr_pcgc_tpu.runtime.codec import params_template

    ds, _ = small_dataset(1, n_pts=1200)
    cfg = ModelConfig(scale_num=ds.scale_num)
    tc = TrainConfig()
    rd = str(tmp_path / "out")
    path = overfit_gop(
        dataset=ds, group_range=range(0, 1), epoch_num=2, cfg=cfg, tc=tc,
        result_dir=rd, handle_dir=str(tmp_path / "tmp"),
    )
    _, _, meta1 = load_checkpoint(path, params_template(cfg))
    assert meta1["epoch"] == 1
    # resume to epoch 4: continues, does not restart
    path = overfit_gop(
        dataset=ds, group_range=range(0, 1), epoch_num=4, cfg=cfg, tc=tc,
        result_dir=rd, handle_dir=str(tmp_path / "tmp"), resume=True,
    )
    _, _, meta2 = load_checkpoint(path, params_template(cfg))
    assert meta2["epoch"] == 3
    # resuming past the target is a no-op
    path = overfit_gop(
        dataset=ds, group_range=range(0, 1), epoch_num=3, cfg=cfg, tc=tc,
        result_dir=rd, handle_dir=str(tmp_path / "tmp"), resume=True,
    )
    _, _, meta3 = load_checkpoint(path, params_template(cfg))
    assert meta3["epoch"] == 3


def test_standalone_decode_resnet_block_type(tmp_path):
    """block_type must survive the side info (ADVICE r2): a resnet-core
    model has a different parameter count than inception, so a standalone
    decode (cfg=None) that dropped it would rebuild the wrong network."""
    from linr_pcgc_tpu.runtime.codec import cfg_side_info, cfg_from_side_info

    cfg = ModelConfig(scale_num=4, block_type="resnet", block_layers=2)
    rt = cfg_from_side_info({"model_cfg": cfg_side_info(cfg)})
    assert rt == cfg
    # pre-round-3 side infos carry no block_type field -> inception
    legacy = {k: v for k, v in cfg_side_info(ModelConfig(scale_num=4)).items()
              if k != "block_type"}
    assert cfg_from_side_info({"model_cfg": legacy}).block_type == "inception"

    ds, frames = small_dataset(1, n_pts=900)
    cfg = ModelConfig(scale_num=ds.scale_num, block_type="resnet")
    params = init_params(jax.random.PRNGKey(7), cfg)
    model_path = str(tmp_path / "model.npz")
    save_checkpoint(model_path, params, adam_init(params), 0.01, 0, 1.0, 8)
    enc_dir = str(tmp_path / "enc" / "gop_0_0")
    encode_gop(model_path, [ds[0]], enc_dir, cfg)
    decoded = decode_gop(enc_dir, None, cfg=None)
    np.testing.assert_array_equal(decoded[0], np.unique(frames[0], axis=0))


def test_standalone_decode_dilation_block_type(tmp_path):
    """block_type='dilation' (DilatedResNet, resnet.py:97-143) end to end:
    the codec must route to the gather backend (the brick layouts carry no
    d=2 neighbor map), the side info must reconstruct the dilated network,
    and decode must be lossless."""
    from linr_pcgc_tpu.runtime.codec import (
        cfg_side_info, cfg_from_side_info, _use_sb,
    )

    cfg = ModelConfig(scale_num=4, block_type="dilation")
    assert not _use_sb(cfg)
    assert cfg_from_side_info({"model_cfg": cfg_side_info(cfg)}) == cfg

    ds, frames = small_dataset(1, n_pts=900)
    cfg = ModelConfig(scale_num=ds.scale_num, block_type="dilation")
    params = init_params(jax.random.PRNGKey(9), cfg)
    model_path = str(tmp_path / "model.npz")
    save_checkpoint(model_path, params, adam_init(params), 0.01, 0, 1.0, 8)
    enc_dir = str(tmp_path / "enc" / "gop_0_0")
    encode_gop(model_path, [ds[0]], enc_dir, cfg)
    decoded = decode_gop(enc_dir, None, cfg=None)
    np.testing.assert_array_equal(decoded[0], np.unique(frames[0], axis=0))


def test_standalone_decode_outstage_grouping(tmp_path):
    """outstage=3 (ragged groups 2/2/4, get_stage_lst upsample.py:24-35)
    end to end: the codec must route to the gather backend, the grouping
    must survive the side info, and standalone decode (cfg=None) must be
    lossless (VERDICT r2 missing #3)."""
    from linr_pcgc_tpu.runtime.codec import (
        cfg_side_info, cfg_from_side_info, _use_sb,
    )

    cfg = ModelConfig(scale_num=4, outstage=3)
    assert not _use_sb(cfg)
    assert cfg_from_side_info({"model_cfg": cfg_side_info(cfg)}) == cfg

    ds, frames = small_dataset(1, n_pts=900)
    cfg = ModelConfig(scale_num=ds.scale_num, outstage=3)
    params = init_params(jax.random.PRNGKey(11), cfg)
    model_path = str(tmp_path / "model.npz")
    save_checkpoint(model_path, params, adam_init(params), 0.01, 0, 1.0, 8)
    enc_dir = str(tmp_path / "enc" / "gop_0_0")
    encode_gop(model_path, [ds[0]], enc_dir, cfg)
    decoded = decode_gop(enc_dir, None, cfg=None)
    np.testing.assert_array_equal(decoded[0], np.unique(frames[0], axis=0))


def test_fused_probs_roundtrip(monkeypatch):
    """probs_mode="fused" (the default): BOTH sides run the one cs=8
    `_fused_probs` executable — the encoder once per level on full
    ground-truth occupancy, the decoder once per stage on its partial
    buffers, keeping row j.  The tri mask zeroes channels >= j exactly,
    so row j is bitwise identical by construction; a single f16 mismatch
    would derail the rANS decode and trip the frame_points backstop, so
    this lossless roundtrip IS the bitwise assertion."""
    from linr_pcgc_tpu.runtime.codec import (
        decode_gop_streams,
        encode_gop_streams,
    )

    monkeypatch.setenv("LINR_CODEC_PROBS", "fused")
    ds, frames = small_dataset(2, n_pts=2500)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(5), cfg)
    pyrs = [ds[0], ds[1]]
    wire, _ = encode_gop_streams(params, cfg, pyrs)
    decoded = decode_gop_streams(params, cfg, wire, [p.low_coords for p in pyrs])
    for dec, f in zip(decoded, frames):
        np.testing.assert_array_equal(
            dec, np.unique(f - f.min(axis=0), axis=0)
        )


def test_fused_probs_cs_capped_roundtrip(tmp_path, monkeypatch):
    """The fused executable's stage-batch width cs is capped by a shared
    HBM model (_fused_cs): at production level-0 shapes cs=8 was measured
    to need 28.8 GB of temp on a 15.75 GB chip, so the encoder splits the
    all-stage pass into outstage/cs calls and the decoder derives the
    SAME cs from the same shapes.  Force a tiny budget so the split path
    (cs < 8) runs end to end, and check the budget travels in side_info:
    a decoder whose env default differs must adopt the encoder's value or
    it would build differently-shaped (non-bit-identical) executables."""
    import json

    from linr_pcgc_tpu.runtime.codec import encode_gop, decode_gop
    from linr_pcgc_tpu.runtime.dev_codec import _fused_cs
    from linr_pcgc_tpu.runtime.overfit import adam_init, save_checkpoint

    tiny = 2e-6  # ~2 KB: forces cs=1 at any real brick count
    assert _fused_cs(1000, ModelConfig(scale_num=3), tiny) == 1
    assert _fused_cs(1000, ModelConfig(scale_num=3), 8.0) == 8

    monkeypatch.setenv("LINR_CODEC_PROBS", "fused")
    monkeypatch.setenv("LINR_FUSED_BUDGET_GB", str(tiny))
    ds, frames = small_dataset(1, n_pts=2200)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(9), cfg)
    model_path = str(tmp_path / "model.npz")
    save_checkpoint(model_path, params, adam_init(params), 0.01, 0, 1.0, 8)
    enc_dir = str(tmp_path / "enc")
    encode_gop(model_path, [ds[0]], enc_dir, cfg)
    with open(tmp_path / "enc" / "side_info.json") as f:
        assert json.load(f)["numerics"]["fused_budget_gb"] == tiny

    monkeypatch.delenv("LINR_FUSED_BUDGET_GB")  # decoder env default (8 GB)
    decoded = decode_gop(enc_dir, None, cfg=None)
    np.testing.assert_array_equal(decoded[0], np.unique(frames[0], axis=0))


def test_fused_cs_latency_cap_roundtrip(tmp_path, monkeypatch):
    """The fused width is ALSO capped for latency (dev_codec._fused_cs_cap):
    the decoder re-dispatches the cs-wide executable per stage and keeps
    one row, so small cs is decode-optimal while the encoder prefers
    large cs; the shared compromise travels in
    side_info["numerics"]["fused_cs_cap"] and the decoder adopts it even
    when its env default differs (differently-shaped executables are not
    bit-interchangeable)."""
    import json

    from linr_pcgc_tpu.runtime.codec import encode_gop, decode_gop
    from linr_pcgc_tpu.runtime.dev_codec import _fused_cs
    from linr_pcgc_tpu.runtime.overfit import adam_init, save_checkpoint

    cfg3 = ModelConfig(scale_num=3)
    assert _fused_cs(1000, cfg3, 8.0, 2) == 2
    assert _fused_cs(1000, cfg3, 8.0, 1) == 1
    assert _fused_cs(1000, cfg3, 8.0, None) == 8  # uncapped (pre-cap wire)

    monkeypatch.setenv("LINR_CODEC_PROBS", "fused")
    monkeypatch.setenv("LINR_FUSED_CS_CAP", "1")
    ds, frames = small_dataset(1, n_pts=2200)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(11), cfg)
    model_path = str(tmp_path / "model.npz")
    save_checkpoint(model_path, params, adam_init(params), 0.01, 0, 1.0, 8)
    enc_dir = str(tmp_path / "enc")
    encode_gop(model_path, [ds[0]], enc_dir, cfg)
    with open(tmp_path / "enc" / "side_info.json") as f:
        assert json.load(f)["numerics"]["fused_cs_cap"] == 1

    monkeypatch.delenv("LINR_FUSED_CS_CAP")  # decoder env default (2)
    decoded = decode_gop(enc_dir, None, cfg=None)
    np.testing.assert_array_equal(decoded[0], np.unique(frames[0], axis=0))


def test_stage_probs_roundtrip(monkeypatch):
    """probs_mode="stage" (the pre-round-4 wire, 8 x the cs=1
    `_stage_step` executable on both sides) stays lossless end to end on
    the rANS wire."""
    from linr_pcgc_tpu.runtime.codec import (
        decode_gop_streams,
        encode_gop_streams,
    )

    monkeypatch.setenv("LINR_CODEC_PROBS", "stage")
    ds, frames = small_dataset(2, n_pts=2000)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(6), cfg)
    pyrs = [ds[0], ds[1]]
    wire, _ = encode_gop_streams(params, cfg, pyrs)
    decoded = decode_gop_streams(params, cfg, wire, [p.low_coords for p in pyrs])
    for dec, f in zip(decoded, frames):
        np.testing.assert_array_equal(
            dec, np.unique(f - f.min(axis=0), axis=0)
        )


def test_probs_mode_adopted_from_side_info(tmp_path, monkeypatch):
    """The probs executable shape travels with the bitstream: a stream
    encoded in fused mode must decode losslessly even when the decoder's
    environment says "stage" — decode_gop adopts side_info's value
    (unlike dtype/conv_kernel, which refuse on mismatch)."""
    import json

    from linr_pcgc_tpu.runtime.codec import encode_gop, decode_gop
    from linr_pcgc_tpu.runtime.overfit import adam_init, save_checkpoint

    monkeypatch.setenv("LINR_CODEC_PROBS", "fused")
    ds, frames = small_dataset(1, n_pts=2000)
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(7), cfg)
    model_path = str(tmp_path / "model.npz")
    save_checkpoint(model_path, params, adam_init(params), 0.01, 0, 1.0, 8)
    enc_dir = str(tmp_path / "enc")
    encode_gop(model_path, [ds[0]], enc_dir, cfg)
    with open(tmp_path / "enc" / "side_info.json") as f:
        assert json.load(f)["numerics"]["probs"] == "fused"

    monkeypatch.setenv("LINR_CODEC_PROBS", "stage")  # decoder env differs
    decoded = decode_gop(enc_dir, None, cfg=None)
    np.testing.assert_array_equal(decoded[0], np.unique(frames[0], axis=0))
