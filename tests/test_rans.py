"""Device-resident rANS entropy coder (ops/rans.py).

The coder replaces the reference's host arithmetic coder fed by per-stage
GPU->CPU probability copies (/root/reference/models/module_utils.py:8-40);
correctness here is (a) the numpy reference implementation round-trips,
(b) the JAX scan kernels produce byte-identical streams and bit-identical
decodes vs the numpy twin (encoder and decoder run on different hosts in
production, so cross-implementation identity is the real requirement).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from linr_pcgc_tpu.ops.rans import (
    LANES,
    PROB_SCALE,
    np_rans_decode,
    np_rans_encode,
    pack_rans_blob,
    rans_compact_emissions,
    rans_decode_segment,
    rans_encode_segment,
    rans_initial_states,
    unpack_rans_blob,
)


def _make_segments(seed, seg_steps, skew=None):
    """Random (probs, bits, valid) segments; bits sampled FROM the probs so
    the stream exercises realistic (compressible) statistics."""
    rng = np.random.default_rng(seed)
    probs, bits, valid = [], [], []
    for i, steps in enumerate(seg_steps):
        n = steps * LANES
        p = rng.uniform(0.001, 0.999, n).astype(np.float32)
        if skew == "low":  # loot-like regime: most bits predictable
            p = np.where(rng.uniform(size=n) < 0.8, 0.02, p).astype(np.float32)
        v = rng.uniform(size=n) < (0.9 if i % 2 else 1.0)
        if not v.any():
            v[0] = True
        b = (rng.uniform(size=n) < p).astype(np.uint8)
        b = np.where(v, b, 0).astype(np.uint8)
        probs.append(p)
        bits.append(b)
        valid.append(v)
    return probs, bits, valid


@pytest.mark.parametrize("seed,steps", [(0, [4, 2, 8]), (1, [1]), (2, [16, 16])])
def test_np_roundtrip(seed, steps):
    probs, bits, valid = _make_segments(seed, steps)
    states, streams = np_rans_encode(probs, bits, valid)
    dec, _ = np_rans_decode(states, streams, probs, valid)
    for d, b in zip(dec, bits):
        np.testing.assert_array_equal(d, b)


def test_np_roundtrip_low_entropy_rate():
    """In the skewed regime the stream must actually compress (sanity that
    frequencies wire through; ideal rate for p=0.02 bits ~0.14 b/sym)."""
    probs, bits, valid = _make_segments(7, [64, 64], skew="low")
    states, streams = np_rans_encode(probs, bits, valid)
    n_sym = sum(v.sum() for v in valid)
    total_bytes = sum(len(s) for s in streams)
    ideal = -sum(
        (b * np.log2(np.maximum(p, 1e-9))
         + (1 - b) * np.log2(np.maximum(1 - p, 1e-9)))[v].sum()
        for p, b, v in zip(probs, bits, valid)
    ) / 8.0
    assert total_bytes < 0.55 * n_sym / 8  # far below 1 bit/symbol
    assert total_bytes < ideal * 1.05 + 2 * LANES  # near-optimal + state flush


def test_device_encode_matches_np():
    """JAX encoder (reverse scan + compaction) emits byte-identical lane
    streams and final states vs the numpy twin."""
    probs, bits, valid = _make_segments(3, [8, 4], skew="low")
    np_states, np_streams = np_rans_encode(probs, bits, valid)

    states = rans_initial_states()
    per_seg = [None] * len(probs)
    for i in reversed(range(len(probs))):  # encode in reverse decode order
        states, byts, mask = rans_encode_segment(
            states,
            jnp.asarray(probs[i]),
            jnp.asarray(bits[i]),
            jnp.asarray(valid[i]),
        )
        per_seg[i] = (np.asarray(byts), np.asarray(mask))
    cat_b = jnp.asarray(np.concatenate([b for b, _ in per_seg], axis=0))
    cat_m = jnp.asarray(np.concatenate([m for _, m in per_seg], axis=0))
    lane_len, out = rans_compact_emissions(cat_b, cat_m, out_bucket=512)
    lane_len = np.asarray(lane_len)
    out = np.asarray(out)

    np.testing.assert_array_equal(np.asarray(states), np_states)
    for l in range(LANES):
        assert lane_len[l] == len(np_streams[l]), l
        np.testing.assert_array_equal(
            out[l, : lane_len[l]], np.frombuffer(np_streams[l], np.uint8)
        )


def test_device_decode_matches_np_blob():
    """JAX decoder consumes the packed blob (np-encoded) and reproduces the
    bits and cursor discipline across chained segments."""
    probs, bits, valid = _make_segments(4, [8, 4, 2], skew="low")
    np_states, np_streams = np_rans_encode(probs, bits, valid)
    blob = pack_rans_blob(np_states, np_streams)
    states, flat, offs = unpack_rans_blob(blob)

    st = jnp.asarray(states)
    cur = jnp.asarray(offs.astype(np.int32))
    stream = jnp.asarray(flat)
    for i in range(len(probs)):
        st, cur, dec = rans_decode_segment(
            st, cur, stream, jnp.asarray(probs[i]), jnp.asarray(valid[i])
        )
        np.testing.assert_array_equal(np.asarray(dec), bits[i])
    # every lane consumed exactly its stream
    lens = np.array([len(s) for s in np_streams], np.int64)
    np.testing.assert_array_equal(np.asarray(cur), offs + lens)


def test_device_roundtrip_end_to_end():
    """Full device chain: encode -> compact -> blob -> decode."""
    probs, bits, valid = _make_segments(5, [4, 4], skew="low")
    states = rans_initial_states()
    per_seg = [None] * len(probs)
    for i in reversed(range(len(probs))):
        states, byts, mask = rans_encode_segment(
            states, jnp.asarray(probs[i]), jnp.asarray(bits[i]),
            jnp.asarray(valid[i]),
        )
        per_seg[i] = (np.asarray(byts), np.asarray(mask))
    cat_b = jnp.asarray(np.concatenate([b for b, _ in per_seg], axis=0))
    cat_m = jnp.asarray(np.concatenate([m for _, m in per_seg], axis=0))
    lane_len, out = rans_compact_emissions(cat_b, cat_m, out_bucket=256)
    lane_len, out = np.asarray(lane_len), np.asarray(out)
    blob = pack_rans_blob(
        np.asarray(states), [out[l, : lane_len[l]].tobytes() for l in range(LANES)]
    )

    st_h, flat, offs = unpack_rans_blob(blob)
    st = jnp.asarray(st_h)
    cur = jnp.asarray(offs.astype(np.int32))
    stream = jnp.asarray(flat)
    for i in range(len(probs)):
        st, cur, dec = rans_decode_segment(
            st, cur, stream, jnp.asarray(probs[i]), jnp.asarray(valid[i])
        )
        np.testing.assert_array_equal(np.asarray(dec), bits[i])


def test_f16_prob_freq_stability():
    """The production wire derives frequencies from f16 probabilities on
    both sides; f16 -> f32 -> frequency must be deterministic and match the
    numpy twin exactly (the bit-exactness contract)."""
    rng = np.random.default_rng(9)
    p16 = rng.uniform(0.0, 1.0, 4 * LANES).astype(np.float16)
    v = np.ones(4 * LANES, bool)
    from linr_pcgc_tpu.ops.rans import freq1_from_prob, np_freq1_from_prob

    f_dev = np.asarray(freq1_from_prob(jnp.asarray(p16.astype(np.float32)),
                                       jnp.asarray(v)))
    f_np = np_freq1_from_prob(p16.astype(np.float32), v)
    np.testing.assert_array_equal(f_dev, f_np)
    assert f_dev.min() >= 1 and f_dev.max() <= PROB_SCALE - 1


# ------------------------------------------------- codec-path integration --


def _codec_setup(n_frames, n_pts=3000):
    import jax
    from linr_pcgc_tpu.data import PyramidDataset, synthetic_cloud
    from linr_pcgc_tpu.models import ModelConfig, init_params

    frames = [synthetic_cloud(n_pts, depth=7, seed=s) for s in range(n_frames)]
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(0), cfg)
    pyrs = [ds[i] for i in range(n_frames)]
    return cfg, params, pyrs, frames


def test_rans_codec_multichunk_lossless(monkeypatch):
    """3 frames through a 2-frame chunk size: two independent rANS chunk
    blobs, state chains within each, lossless roundtrip across both."""
    from linr_pcgc_tpu.runtime import dev_codec
    from linr_pcgc_tpu.runtime.codec import (
        decode_gop_streams,
        encode_gop_streams,
    )

    monkeypatch.setattr(dev_codec, "CODEC_FRAME_CHUNK", 2)
    cfg, params, pyrs, frames = _codec_setup(3)
    wire, bits = encode_gop_streams(params, cfg, pyrs)
    assert isinstance(wire, dict) and len(wire["rans"]) == 2
    decoded = decode_gop_streams(params, cfg, wire, [p.low_coords for p in pyrs])
    for dec, f in zip(decoded, frames):
        np.testing.assert_array_equal(dec, np.unique(f - f.min(axis=0), axis=0))


def test_rans_vs_ac_rate_parity(monkeypatch):
    """The device rANS wire must cost ~the same bits as the host AC wire
    (same 16-bit probability staircase resolution).  The rANS chunk
    header (8 + 8 x LANES bytes of {state,len} per chunk, ~0.1% of a
    production chunk's wire) is subtracted before comparing: at THIS
    test's size it would dominate, which says nothing about coding
    efficiency."""
    from linr_pcgc_tpu.ops.rans import LANES
    from linr_pcgc_tpu.runtime.codec import encode_gop_streams

    cfg, params, pyrs, _ = _codec_setup(2)
    wire_r, bits_rans = encode_gop_streams(params, cfg, pyrs)
    assert isinstance(wire_r, dict)
    n_chunks = len(wire_r["rans"])
    header_bits = 8 * (8 + 8 * LANES) * n_chunks
    monkeypatch.setenv("LINR_CODEC_ENTROPY", "ac")
    wire_a, bits_ac = encode_gop_streams(params, cfg, pyrs)
    assert not isinstance(wire_a, dict)
    # untrained probs ~ 1 bit/symbol; payloads must match closely.  The
    # payload may legitimately UNDERSHOOT the AC stream: each final lane
    # state (header) absorbs up to 8 bits of payload information (the
    # state grows from 2^23 toward 2^31 and is never flushed), so allow
    # 8 x LANES bits per chunk on the low side.
    payload = bits_rans - header_bits
    state_info_bits = 8 * LANES * n_chunks
    assert payload < bits_ac * 1.05, (payload, bits_ac)
    assert payload + state_info_bits > bits_ac * 0.95, (payload, bits_ac)


def test_ac_fallback_lossless(monkeypatch):
    """LINR_CODEC_ENTROPY=ac restores the host-AC wire end to end."""
    from linr_pcgc_tpu.runtime.codec import (
        decode_gop_streams,
        encode_gop_streams,
    )

    monkeypatch.setenv("LINR_CODEC_ENTROPY", "ac")
    cfg, params, pyrs, frames = _codec_setup(2)
    blobs, _ = encode_gop_streams(params, cfg, pyrs)
    assert isinstance(blobs, list)
    decoded = decode_gop_streams(params, cfg, blobs, [p.low_coords for p in pyrs])
    for dec, f in zip(decoded, frames):
        np.testing.assert_array_equal(dec, np.unique(f - f.min(axis=0), axis=0))


def test_rans_blob_crc_detects_corruption():
    """rans-v2 blobs carry a CRC32 of the lane streams: a flipped byte
    must fail loudly at unpack, not decode silently into the next lane
    (round-3 advisor).  v1 blobs (no flag bit) stay readable."""
    from linr_pcgc_tpu.ops.rans import LANES, pack_rans_blob, unpack_rans_blob

    states = (np.arange(LANES, dtype=np.uint32) + (1 << 23)).astype(np.uint32)
    streams = [bytes([i % 256, (i * 7) % 256, (i * 13) % 256]) for i in range(LANES)]
    blob = pack_rans_blob(states, streams)
    st, flat, offs = unpack_rans_blob(blob)
    np.testing.assert_array_equal(st, states)
    assert flat[:-1].tobytes() == b"".join(streams)  # sentinel-padded

    bad = bytearray(blob)
    bad[-3] ^= 0x40  # corrupt a lane stream byte
    with pytest.raises(ValueError, match="CRC"):
        unpack_rans_blob(bytes(bad))

    # a v1 blob: plain LANES word, no CRC field
    v1 = np.asarray([LANES], np.uint32).tobytes() + blob[8:]
    st1, flat1, _ = unpack_rans_blob(v1)
    np.testing.assert_array_equal(st1, states)
    np.testing.assert_array_equal(flat1, flat)
