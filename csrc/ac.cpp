// Host-side arithmetic coder for linr_pcgc_tpu.
//
// Implements the float-CDF entropy-coding convention used by the reference
// codec's bitstreams (the torchac convention; see the wrappers at
// /root/reference/models/module_utils.py:8-40 and the weight codec at
// /root/reference/model_compression/model_size_est.py:463-489):
//
//   * A per-symbol CDF row of Lp = S + 1 float32 entries is quantized to
//     16-bit integers as  q(j) = round_half_even(cdf[j] * (2^16 - (Lp-1))) + j,
//     reinterpreted modulo 2^16.  The "+ j" staircase guarantees every
//     symbol interval has width >= 1 so any symbol is decodable.
//   * The top symbol's upper bound is 2^16 exactly (the quantized last entry
//     wraps and is never read).
//   * The coder itself is the classic 32-bit carry-less binary arithmetic
//     coder with pending-bit renormalization (Witten-Neal-Cleary style, as
//     popularized by Nelson's "Data Compression With Arithmetic Coding"),
//     emitting bits MSB-first into bytes, zero-padded at the end; the
//     decoder reads zeros past the end of the stream.
//
// Two front-ends:
//   * binary occupancy mode: per-symbol P(bit=1) as float32, CDF row
//     conceptually [0, 1-p, 1] (module_utils.py:11-16);
//   * shared-CDF mode: one CDF row applied to every symbol (the weight
//     codec's Laplace table; the reference materializes N copies of the row,
//     we do not need to).
//
// Everything is plain C ABI for ctypes binding; batch entry points use
// OpenMP to code many independent streams in parallel (decode of a GOP
// processes 8 stages x 7 scales x F frames of independent streams).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr uint32_t kTop = 0xFFFFFFFFu;
constexpr uint32_t kHalf = 0x80000000u;
constexpr uint32_t kQuarter = 0x40000000u;
constexpr uint32_t kThreeQuarter = 0xC0000000u;
constexpr int kPrecision = 16;
constexpr uint32_t kWhole16 = 1u << kPrecision;  // 0x10000

// Quantize one float CDF entry at staircase position j for a row of Lp
// entries.  Matches round-half-to-even (torch.round / IEEE default).
static inline uint32_t quantize_cdf(float c, int j, int Lp) {
  const float factor = static_cast<float>(kWhole16 - (Lp - 1));
  const long v = lrintf(c * factor);
  return static_cast<uint32_t>((v + j) & 0xFFFF);
}

struct BitWriter {
  uint8_t* buf;
  int64_t cap;
  int64_t nbytes = 0;
  uint8_t cur = 0;
  int nbits = 0;
  bool overflow = false;

  explicit BitWriter(uint8_t* b, int64_t c) : buf(b), cap(c) {}

  inline void put(int bit) {
    cur = static_cast<uint8_t>((cur << 1) | (bit & 1));
    if (++nbits == 8) {
      if (nbytes < cap) {
        buf[nbytes++] = cur;
      } else {
        overflow = true;
      }
      cur = 0;
      nbits = 0;
    }
  }

  inline void put_with_pending(int bit, uint64_t& pending) {
    put(bit);
    for (; pending > 0; --pending) put(!bit);
  }

  // Pad the last partial byte with zeros.
  inline void flush() {
    while (nbits != 0) put(0);
  }
};

struct BitReader {
  const uint8_t* buf;
  int64_t len;
  int64_t pos = 0;
  int nbits = 0;
  uint8_t cur = 0;

  explicit BitReader(const uint8_t* b, int64_t l) : buf(b), len(l) {}

  inline int get() {
    if (nbits == 0) {
      cur = (pos < len) ? buf[pos++] : 0;  // zeros past the end
      nbits = 8;
    }
    --nbits;
    return (cur >> nbits) & 1;
  }
};

struct Encoder {
  BitWriter w;
  uint32_t low = 0;
  uint32_t high = kTop;
  uint64_t pending = 0;

  explicit Encoder(uint8_t* buf, int64_t cap) : w(buf, cap) {}

  inline void step(uint32_t c_low, uint32_t c_high) {
    const uint64_t span = static_cast<uint64_t>(high) - low + 1;
    high = low + static_cast<uint32_t>((span * c_high) >> kPrecision) - 1;
    low = low + static_cast<uint32_t>((span * c_low) >> kPrecision);
    for (;;) {
      if (high < kHalf) {
        w.put_with_pending(0, pending);
      } else if (low >= kHalf) {
        w.put_with_pending(1, pending);
        low -= kHalf;
        high -= kHalf;
      } else if (low >= kQuarter && high < kThreeQuarter) {
        ++pending;
        low -= kQuarter;
        high -= kQuarter;
      } else {
        break;
      }
      low <<= 1;
      high = (high << 1) | 1;
    }
  }

  // Returns the number of bytes written, or -1 on overflow.
  inline int64_t finish() {
    ++pending;
    w.put_with_pending(low >= kQuarter ? 1 : 0, pending);
    w.flush();
    return w.overflow ? -1 : w.nbytes;
  }
};

struct Decoder {
  BitReader r;
  uint32_t low = 0;
  uint32_t high = kTop;
  uint32_t value = 0;

  explicit Decoder(const uint8_t* buf, int64_t len) : r(buf, len) {
    for (int i = 0; i < 32; ++i) value = (value << 1) | r.get();
  }

  inline uint32_t target() const {
    const uint64_t span = static_cast<uint64_t>(high) - low + 1;
    return static_cast<uint32_t>(
        (((static_cast<uint64_t>(value) - low + 1) << kPrecision) - 1) / span);
  }

  inline void step(uint32_t c_low, uint32_t c_high) {
    const uint64_t span = static_cast<uint64_t>(high) - low + 1;
    high = low + static_cast<uint32_t>((span * c_high) >> kPrecision) - 1;
    low = low + static_cast<uint32_t>((span * c_low) >> kPrecision);
    for (;;) {
      if (high < kHalf) {
        // nothing
      } else if (low >= kHalf) {
        value -= kHalf;
        low -= kHalf;
        high -= kHalf;
      } else if (low >= kQuarter && high < kThreeQuarter) {
        value -= kQuarter;
        low -= kQuarter;
        high -= kQuarter;
      } else {
        break;
      }
      low <<= 1;
      high = (high << 1) | 1;
      value = (value << 1) | r.get();
    }
  }
};

// Binary-mode CDF boundary: upper edge of symbol 0 for row [0, 1-p, 1].
static inline uint32_t binary_boundary(float p1) {
  return quantize_cdf(1.0f - p1, 1, 3);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- binary --
// Encode n occupancy bits under per-symbol P(bit=1).  Returns bytes written
// or -1 if out_cap was too small (allocate >= 3*n + 64).
int64_t bac_encode(const float* prob, const uint8_t* bits, int64_t n,
                   uint8_t* out, int64_t out_cap) {
  Encoder enc(out, out_cap);
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t b = binary_boundary(prob[i]);
    if (bits[i]) {
      enc.step(b, kWhole16);
    } else {
      enc.step(0, b);
    }
  }
  return enc.finish();
}

int bac_decode(const float* prob, int64_t n, const uint8_t* in, int64_t in_len,
               uint8_t* bits_out) {
  Decoder dec(in, in_len);
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t b = binary_boundary(prob[i]);
    const uint32_t t = dec.target();
    const int bit = t >= b;
    bits_out[i] = static_cast<uint8_t>(bit);
    if (bit) {
      dec.step(b, kWhole16);
    } else {
      dec.step(0, b);
    }
  }
  return 0;
}

// Estimated code length in bits under the *float* probabilities (matches
// the reference's estimate_bitrate, module_utils.py:18-24): sum of
// -log2(p_true).  Informational only; the real size comes from encoding.
double bac_estimate_bits(const float* prob, const uint8_t* bits, int64_t n) {
  double total = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    const double p = bits[i] ? prob[i] : 1.0 - static_cast<double>(prob[i]);
    total -= log2(p > 0 ? p : 1e-300);
  }
  return total;
}

// ------------------------------------------------------------ shared CDF --
// One float CDF row (Lp entries) shared by all n symbols; symbols int16 in
// [0, Lp-2].  Returns bytes written or -1 on overflow.
int64_t ac_encode_shared_cdf(const float* cdf, int32_t Lp, const int16_t* syms,
                             int64_t n, uint8_t* out, int64_t out_cap) {
  const int S = Lp - 1;  // number of symbols
  std::vector<uint32_t> q(static_cast<size_t>(S) + 1);
  for (int j = 0; j < S; ++j) q[j] = quantize_cdf(cdf[j], j, Lp);
  q[S] = kWhole16;
  Encoder enc(out, out_cap);
  for (int64_t i = 0; i < n; ++i) {
    const int s = syms[i];
    if (s < 0 || s >= S) return -2;
    enc.step(q[s], q[s + 1]);
  }
  return enc.finish();
}

int ac_decode_shared_cdf(const float* cdf, int32_t Lp, int64_t n,
                         const uint8_t* in, int64_t in_len, int16_t* syms_out) {
  const int S = Lp - 1;
  std::vector<uint32_t> q(static_cast<size_t>(S) + 1);
  for (int j = 0; j < S; ++j) q[j] = quantize_cdf(cdf[j], j, Lp);
  q[S] = kWhole16;
  Decoder dec(in, in_len);
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t t = dec.target();
    // Largest s in [0, S-1] with q[s] <= t  (q is strictly increasing on
    // [0, S-1] thanks to the staircase).
    int lo = 0, hi = S - 1;
    while (lo < hi) {
      const int mid = (lo + hi + 1) >> 1;
      if (q[mid] <= t) {
        lo = mid;
      } else {
        hi = mid - 1;
      }
    }
    syms_out[i] = static_cast<int16_t>(lo);
    dec.step(q[lo], q[lo + 1]);
  }
  return 0;
}

// ----------------------------------------------------------------- batch --
// Encode `m` independent binary streams in parallel.  probs/bits are
// concatenated with prefix offsets[m+1]; out is a single buffer where
// stream k may use out[out_offsets[k] .. out_offsets[k+1]); actual sizes are
// written to out_sizes[k] (-1 on overflow of that slot).
void bac_encode_batch(const float* prob, const uint8_t* bits,
                      const int64_t* offsets, int32_t m, uint8_t* out,
                      const int64_t* out_offsets, int64_t* out_sizes) {
#pragma omp parallel for schedule(dynamic)
  for (int32_t k = 0; k < m; ++k) {
    const int64_t a = offsets[k], b = offsets[k + 1];
    out_sizes[k] = bac_encode(prob + a, bits + a, b - a,
                              out + out_offsets[k],
                              out_offsets[k + 1] - out_offsets[k]);
  }
}

// Decode `m` independent binary streams in parallel.
void bac_decode_batch(const float* prob, const int64_t* offsets, int32_t m,
                      const uint8_t* in, const int64_t* in_offsets,
                      uint8_t* bits_out) {
#pragma omp parallel for schedule(dynamic)
  for (int32_t k = 0; k < m; ++k) {
    const int64_t a = offsets[k], b = offsets[k + 1];
    bac_decode(prob + a, b - a, in + in_offsets[k],
               in_offsets[k + 1] - in_offsets[k], bits_out + a);
  }
}

int ac_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
