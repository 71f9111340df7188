"""Fuzz/roundtrip tests for the native arithmetic coder and containers.

Mirrors the reference's inline AC roundtrip asserts (upsample.py:236-237,
model_size_est.py:286) as a real fuzz suite, plus compression-ratio sanity
checks against the cross-entropy bound.
"""

import numpy as np
import pytest

from linr_pcgc_tpu.coding import (
    binary_encode,
    binary_decode,
    binary_encode_batch,
    binary_decode_batch,
    binary_estimate_bits,
    shared_cdf_encode,
    shared_cdf_decode,
    pack_bitstream,
    unpack_bitstream,
)


@pytest.mark.parametrize("n", [0, 1, 2, 7, 100, 4096, 100_000])
def test_binary_roundtrip_random(n):
    rng = np.random.default_rng(n)
    prob = rng.uniform(1e-6, 1 - 1e-6, n).astype(np.float32)
    bits = (rng.uniform(size=n) < prob).astype(np.uint8)
    stream = binary_encode(prob, bits)
    dec = binary_decode(prob, stream)
    np.testing.assert_array_equal(dec, bits)


def test_binary_roundtrip_extreme_probs():
    # Sigmoid outputs can saturate numerically; coder must stay lossless
    # because interval widths are clamped to >= 1/65536.
    prob = np.array([1e-30, 1 - 1e-7, 0.5, 1e-7, 0.999999], np.float32)
    for bits in ([0, 1, 0, 1, 1], [1, 0, 1, 0, 0], [1, 1, 1, 1, 1]):
        b = np.array(bits, np.uint8)
        assert np.array_equal(binary_decode(prob, binary_encode(prob, b)), b)


def test_binary_roundtrip_adversarial_mismatch():
    # bits drawn opposite to the model: still lossless, just more bytes.
    rng = np.random.default_rng(3)
    n = 20_000
    prob = rng.uniform(0.9, 0.999, n).astype(np.float32)
    bits = np.zeros(n, np.uint8)
    stream = binary_encode(prob, bits)
    assert np.array_equal(binary_decode(prob, stream), bits)


def test_binary_compression_near_entropy():
    rng = np.random.default_rng(4)
    n = 200_000
    prob = np.full(n, 0.95, np.float32)
    bits = (rng.uniform(size=n) < prob).astype(np.uint8)
    stream = binary_encode(prob, bits)
    est = binary_estimate_bits(prob, bits)
    real = len(stream) * 8
    # real size within 2% + small constant of the cross-entropy estimate
    assert real <= est * 1.02 + 64, (real, est)
    assert real >= est * 0.98 - 64


def test_binary_batch_matches_single():
    rng = np.random.default_rng(5)
    probs, bits = [], []
    for k in range(17):
        n = int(rng.integers(0, 5000))
        p = rng.uniform(0.01, 0.99, n).astype(np.float32)
        b = (rng.uniform(size=n) < p).astype(np.uint8)
        probs.append(p)
        bits.append(b)
    streams = binary_encode_batch(probs, bits)
    for p, b, s in zip(probs, bits, streams):
        assert s == binary_encode(p, b)
    decs = binary_decode_batch(probs, streams)
    for b, d in zip(bits, decs):
        np.testing.assert_array_equal(d, b)


def _laplace_cdf_row(bitdepth, mu, b):
    """The weight codec's CDF table (cumsum of normalized Laplace pdf with a
    trailing 0 sentinel, reference model_size_est.py:470-478)."""
    S = int(np.ceil(2**bitdepth))
    x = np.arange(S, dtype=np.float32)
    pdf = np.exp(-np.abs(x - mu) / b) / (2 * b)
    pdf = pdf / pdf.sum()
    cdf = np.cumsum(pdf).astype(np.float32)
    return np.concatenate([cdf, np.zeros(1, np.float32)])


@pytest.mark.parametrize("bitdepth,mu,b", [(8, 131.0, 7.0), (8, 0.0, 1.0), (6, 30.0, 3.0)])
def test_shared_cdf_roundtrip(bitdepth, mu, b):
    rng = np.random.default_rng(6)
    S = 2**bitdepth
    row = _laplace_cdf_row(bitdepth, mu, b)
    syms = np.clip(
        np.round(rng.laplace(mu, b, 60_000)), 0, S - 1
    ).astype(np.int16)
    # force boundary symbols to occur (weight quantization always emits
    # 0 and S-1 by construction)
    syms[0], syms[1] = 0, S - 1
    stream = shared_cdf_encode(row, syms)
    dec = shared_cdf_decode(row, len(syms), stream)
    np.testing.assert_array_equal(dec, syms)
    # compression sanity: near the Laplace entropy, well under raw bitdepth
    assert len(stream) * 8 < bitdepth * len(syms)


def test_shared_cdf_rejects_out_of_range():
    row = _laplace_cdf_row(4, 8.0, 2.0)
    with pytest.raises(ValueError):
        shared_cdf_encode(row, np.array([16], np.int16))


def test_pack_unpack_roundtrip():
    blobs = [b"", b"a", b"hello world", bytes(range(256))]
    data = pack_bitstream(blobs)
    assert unpack_bitstream(data) == blobs
    # wire layout: count, then lengths, little-endian uint32
    assert data[:4] == (4).to_bytes(4, "little")
    assert data[4:8] == (0).to_bytes(4, "little")
    assert data[8:12] == (1).to_bytes(4, "little")


def test_pack_empty():
    assert unpack_bitstream(pack_bitstream([])) == []
