"""Byte-level golden vectors for the torchac convention (round-4 verdict,
missing #4 / next #9).

torchac itself is not installable in this environment, so byte parity is
established against an INDEPENDENT one-page reimplementation of torchac's
published algorithm, transcribed here from its public sources
(github.com/fab-jul/torchac):

  * ``torchac/torchac.py::_convert_to_int_and_normalize``: the float CDF
    row of Lp entries is scaled by (2^16 - (Lp-1)) in float32, rounded
    half-to-even (torch.round), cast to int16, then ``+= arange(Lp)``
    (the staircase that makes every interval width >= 1);
  * ``torchac/backend/torchac.cpp``: classic 32-bit carry-less coder —
    span = high-low+1; high = low-1 + (span*c_high >> 16);
    low += span*c_low >> 16; renormalization by the MASKING formulation
    (``low <<= 1; low &= 0x7FFFFFFF`` / ``high <<= 1; high |= 0x80000001``
    in the straddle case), c_high of the top symbol forced to 2^16,
    int16 CDF entries read back as uint16; finalization
    ``pending += 1; append(low < 0x40000000 ? 0 : 1)`` with pending
    inverse bits; MSB-first bit packing, zero-padded final byte.

Our csrc/ac.cpp implements the same convention with a DIFFERENT low-level
formulation (subtract-and-shift renormalization instead of masking, no
materialized per-symbol rows).  Byte equality between the two on both
front-ends (binary occupancy rows [0, 1-p, 1], module_utils.py:11-16; the
weight codec's shared shifted-Laplace row, model_size_est.py:470-478) is
the evidence that "same convention by construction" actually holds.

A few literal golden byte strings (computed from the reimplementation,
checked by hand for the 1-symbol cases) pin the format against future
regressions in BOTH implementations.
"""

import numpy as np
import pytest

from linr_pcgc_tpu.coding.ac import (
    binary_decode,
    binary_encode,
    shared_cdf_decode,
    shared_cdf_encode,
)

MASK32 = 0xFFFFFFFF


def _round_half_even_f32(x: np.ndarray) -> np.ndarray:
    # np.rint == IEEE round-half-to-even == torch.round
    return np.rint(x.astype(np.float32))


def torchac_quantize_row(row: np.ndarray) -> np.ndarray:
    """_convert_to_int_and_normalize with needs_normalization=True:
    int16(round_f32(c * (2^16 - (Lp-1)))) + j, read back as uint16."""
    lp = len(row)
    scaled = _round_half_even_f32(
        np.asarray(row, np.float32) * np.float32(65536 - (lp - 1))
    )
    q = scaled.astype(np.int64).astype(np.int16) + np.arange(lp, dtype=np.int16)
    return q.astype(np.uint16).astype(np.int64)


class _TorchacEncoder:
    """torchac.cpp's encoder loop, transcribed (masking formulation)."""

    def __init__(self):
        self.low = 0
        self.high = 0xFFFFFFFF
        self.pending = 0
        self.bits = []

    def _append(self, bit):
        self.bits.append(bit)
        while self.pending:
            self.bits.append(1 - bit)
            self.pending -= 1

    def step(self, c_low: int, c_high: int):
        span = self.high - self.low + 1
        self.high = (self.low - 1 + ((span * c_high) >> 16)) & MASK32
        self.low = (self.low + ((span * c_low) >> 16)) & MASK32
        while True:
            if self.high < 0x80000000:
                self._append(0)
                self.low = (self.low << 1) & MASK32
                self.high = ((self.high << 1) | 1) & MASK32
            elif self.low >= 0x80000000:
                self._append(1)
                self.low = (self.low << 1) & MASK32
                self.high = ((self.high << 1) | 1) & MASK32
            elif self.low >= 0x40000000 and self.high < 0xC0000000:
                self.pending += 1
                self.low = (self.low << 1) & 0x7FFFFFFF
                self.high = ((self.high << 1) | 0x80000001) & MASK32
            else:
                break

    def finish(self) -> bytes:
        self.pending += 1
        self._append(0 if self.low < 0x40000000 else 1)
        out = bytearray()
        cur, n = 0, 0
        for b in self.bits:
            cur = (cur << 1) | b
            n += 1
            if n == 8:
                out.append(cur)
                cur, n = 0, 0
        if n:
            out.append(cur << (8 - n))  # zero-pad the last byte
        return bytes(out)


def torchac_encode_float_cdf(rows: np.ndarray, syms: np.ndarray) -> bytes:
    """torchac.encode_float_cdf: per-symbol float CDF rows (N, Lp)."""
    rows = np.atleast_2d(np.asarray(rows, np.float32))
    lp = rows.shape[1]
    max_symbol = lp - 2
    enc = _TorchacEncoder()
    for i, s in enumerate(np.asarray(syms).reshape(-1)):
        q = torchac_quantize_row(rows[i if rows.shape[0] > 1 else 0])
        c_low = int(q[s])
        c_high = 0x10000 if s == max_symbol else int(q[s + 1])
        enc.step(c_low, c_high)
    return enc.finish()


def _binary_rows(prob: np.ndarray) -> np.ndarray:
    """module_utils.py:11-16: per-symbol row [0, 1-p, 1]."""
    p = np.asarray(prob, np.float32).reshape(-1)
    return np.stack([np.zeros_like(p), 1.0 - p, np.ones_like(p)], axis=1)


def _reference_shared_row(mu: float, b: float, bitdepth: int = 8) -> np.ndarray:
    """model_size_est.py:470-478: the SHIFTED row [cumsum(pdf), 0] —
    entry j is P(X<=j) (not the conventional P(X<j)), trailing 0.  Both
    coders consume it identically, so the wire stays self-consistent."""
    x = np.arange(int(np.ceil(2.0**bitdepth)), dtype=np.float64)
    pdf = np.exp(-np.abs(x - mu) / b) / (2.0 * b)
    pdf = pdf / pdf.sum()
    cdf = np.cumsum(pdf)
    return np.concatenate([cdf, [0.0]]).astype(np.float32)


# ------------------------------------------------------------------ binary --


def test_binary_golden_single_symbols():
    """1-symbol streams, hand-checkable: with p1 = 0.5 the boundary is
    q = round(0.5 * 65534) + 1 = 32768; coding bit=1 gives
    [low, high] = [span*32768>>16 - ... ] — the first renorm emits '1'
    and finalization appends '01'; packed MSB-first = 0xA0.  bit=0
    emits '0' then '01' = 0x20."""
    assert binary_encode([0.5], [1]) == bytes([0xA0])
    assert binary_encode([0.5], [0]) == bytes([0x20])
    # parity with the torchac reimplementation on the same rows
    for p, bit in [(0.5, 1), (0.5, 0), (0.9, 1), (0.1, 0), (0.0234, 1)]:
        ours = binary_encode([p], [bit])
        ref = torchac_encode_float_cdf(_binary_rows([p]), [bit])
        assert ours == ref, (p, bit, ours.hex(), ref.hex())


def test_binary_byte_parity_fuzz():
    rng = np.random.default_rng(7)
    for n in [1, 2, 3, 5, 17, 64, 255, 1000]:
        p = rng.uniform(1e-4, 1 - 1e-4, size=n).astype(np.float32)
        bits = (rng.uniform(size=n) < p).astype(np.uint8)
        ours = binary_encode(p, bits)
        ref = torchac_encode_float_cdf(_binary_rows(p), bits)
        assert ours == ref, f"n={n}: {ours.hex()} != {ref.hex()}"
        np.testing.assert_array_equal(binary_decode(p, ours), bits)


def test_binary_golden_literal_vectors():
    """Literal golden bytes (computed from the torchac reimplementation,
    committed as regression pins for the wire format)."""
    p = np.array([0.9, 0.2, 0.7, 0.7, 0.1, 0.5, 0.99, 0.01], np.float32)
    bits = np.array([1, 0, 1, 0, 0, 1, 1, 0], np.uint8)
    stream = binary_encode(p, bits)
    assert stream == bytes.fromhex("68"), stream.hex()
    np.testing.assert_array_equal(binary_decode(p, stream), bits)


# -------------------------------------------------------------- shared CDF --


def test_shared_cdf_byte_parity_fuzz():
    """The weight codec's shifted-Laplace row: our shared-row fast path
    must match torchac fed the materialized per-symbol row copies
    (model_size_est.py:479 repeats the row len(symbols) times)."""
    rng = np.random.default_rng(11)
    for mu, b, n in [(128, 6, 1), (128, 6, 50), (131, 7, 500), (10, 2, 200)]:
        row = _reference_shared_row(mu, b, 8)
        syms = np.clip(
            np.round(rng.laplace(mu, b, size=n)), 0, 255
        ).astype(np.int16)
        ours = shared_cdf_encode(row, syms)
        rows = np.repeat(row[None, :], n, axis=0)
        ref = torchac_encode_float_cdf(rows, syms)
        assert ours == ref, f"(mu={mu},b={b},n={n})"
        np.testing.assert_array_equal(
            shared_cdf_decode(row, n, ours), syms
        )


def test_shared_cdf_golden_literal_vector():
    row = _reference_shared_row(128, 6, 8)
    syms = np.array([128, 127, 130, 255, 0, 128, 129], np.int16)
    stream = shared_cdf_encode(row, syms)
    assert stream == bytes.fromhex("93e7a349ff8b30"), stream.hex()
    np.testing.assert_array_equal(shared_cdf_decode(row, 7, stream), syms)
