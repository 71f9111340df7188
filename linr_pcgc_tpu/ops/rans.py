"""Device-resident interleaved binary rANS — TPU-native entropy coding.

The reference codes occupancy bits with a host arithmetic coder fed by
per-symbol probabilities copied off the GPU every stage
(/root/reference/models/module_utils.py:8-40 BinaryArithmeticCoding,
upsample.py:226-275) — a device->host probability stream that dominates
any transfer-limited link and serializes decode on the host.  Here the
entropy coder itself runs ON the TPU as a lane-vectorized rANS
(range asymmetric numeral system, byte-renormalized, 16-bit probability
precision — the same staircase resolution as the torchac convention), so
probabilities never leave the device and the wire carries only the
actual bitstream:

  * ``LANES`` independent rANS states are carried as a (LANES,) uint32
    vector; symbol ``i`` of a segment belongs to lane ``i % LANES`` and
    scan step ``i // LANES`` — each ``lax.scan`` step encodes/decodes
    LANES symbols with pure elementwise uint32 arithmetic (VPU work, no
    host round trip);
  * states persist across segments (a segment = one (level, stage)
    probability batch), so per-stream overhead is one header per GOP
    frame-chunk (LANES x {state, length}), not per segment;
  * probability -> frequency quantization is elementwise
    (clip(round(p * 2^16), 1, 2^16-1)) from the f16 probabilities both
    codec sides derive from the SAME jitted executable — elementwise IEEE
    ops are fusion-order independent, so encoder/decoder frequencies are
    bit-identical by construction;
  * invalid (bucket-pad) symbols are coded as bit 0 with f1 = 1
    (cost -log2(65535/65536) ~ 2.2e-5 bits each): both sides derive the
    same validity from the shared counts, and the lane geometry stays
    static-shape.

Encoding runs in reverse symbol order (rANS is LIFO): the encoder scans
segments last-to-first with ``lax.scan(reverse=True)``, emitting <= 2
renorm bytes per symbol into per-step slots; the per-lane byte streams
in decode-read order are then just the emitted slots read in ascending
decode order, high slot first (no host-side reversal).

Format constants are frozen as rans-v1: RANS_L = 2^23 state lower bound,
byte renormalization, PROB_BITS = 16, bit-0 interval [0, f0).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# rANS lane count.  The scans are the codec's only sequential device
# work (N/LANES steps per segment) and each step is LATENCY-bound (a
# few dozen elementwise u32 ops on a (LANES,) vector — measured
# ~23 ms per 1M symbols at 1024 lanes, i.e. ~23 us/step regardless of
# lane width): at 128 lanes a production level-0 segment (~3.7M
# symbols) took 28.7k steps = 181 ms/stage on v5e; 1024 lanes cut that
# 8x; 4096 lanes (round 5) cut the step count another 4x for a header
# cost of LANES * 8 B = 32 KB per frame chunk (~0.7% of the wire).
# Segment lengths must divide by LANES: the codec rounds its per-level
# compacted-voxel bucket up to a LANES multiple (_LevelShapes.buckets;
# pad symbols are real coded symbols at ~2e-5 bits each).  LANES is a
# wire-format constant: the blob header records it and the reader
# refuses a mismatch.
LANES = 4096
RANS_L = 1 << 23     # state lower bound (ryg rans_byte convention)
PROB_BITS = 16
PROB_SCALE = 1 << PROB_BITS

U32 = jnp.uint32
U8 = jnp.uint8


# ------------------------------------------------------------ frequencies --


def freq1_from_prob(p, valid):
    """P(bit=1) -> 16-bit frequency, elementwise and fusion-stable.

    ``p`` float (f16-derived f32), ``valid`` bool; invalid lanes get
    f1 = 1 / bit forced 0 by the callers."""
    f1 = jnp.clip(
        jnp.round(p.astype(jnp.float32) * PROB_SCALE).astype(jnp.int32),
        1,
        PROB_SCALE - 1,
    )
    return jnp.where(valid, f1, 1).astype(U32)


def np_freq1_from_prob(p, valid):
    f1 = np.clip(
        np.round(p.astype(np.float32) * PROB_SCALE).astype(np.int64),
        1,
        PROB_SCALE - 1,
    )
    return np.where(valid, f1, 1).astype(np.uint32)


# ------------------------------------------------------- device: decode ----


def _words_table(stream):
    """Repack a (B,) u8 stream into a flat (4 * W,) u32 table of the 4
    byte-shifted little-endian word views: entry k * W + i holds bytes
    stream[4i+k .. 4i+k+3], so the 4-byte window at BYTE position c is
    ONE gather at flat index (c & 3) * W + (c >> 2).

    Why: the decode scan is gather-bound (measured flat across
    unroll/prefetch variants, scripts/prof_rans_unroll.py — baseline
    2 dependent byte-gathers per symbol, 23 ms per 1M symbols on v5e).
    Reading one u32 per TWO symbols (4 bytes = their maximum renorm
    consumption) and slicing bytes out with per-lane dynamic shifts
    cuts the gather count 4x and measures 2.2x faster (10.7 ms/1M).
    The repack is elementwise over the stream and costs ~0.1 ms per
    call at production sizes."""
    b = stream.shape[0]
    w = (b + 3) // 4
    s32 = jnp.concatenate(
        [stream, jnp.zeros((4 * w + 4 - b,), U8)]
    ).astype(U32)
    words = jnp.stack(
        [
            s32[k: k + 4 * w: 4]
            | (s32[k + 1: k + 1 + 4 * w: 4] << 8)
            | (s32[k + 2: k + 2 + 4 * w: 4] << 16)
            | (s32[k + 3: k + 3 + 4 * w: 4] << 24)
            for k in range(4)
        ],
        0,
    ).reshape(-1)
    return words, w


# A words table COMPUTED inside the decode executable gets RE-STAGED
# into VMEM on every scan iteration of the symbol loop — decode cost
# then tracks the STREAM SIZE, not the symbol count (measured, level-0
# segment, same content: 144 ms against an 8 MB stream argument vs
# 1338 ms against 32 MB ~ table bytes x steps / ~350 GB/s; an
# optimization_barrier does NOT help — it is staging, not rebuild).
# Passing the PREBUILT table as an executable ARGUMENT keeps it in HBM
# and the per-step gather is a true dynamic gather: the same segment
# decodes in 30 ms at EITHER size (scripts/prof_dev_codec.py).  The
# production codec therefore builds the table ONCE per frame chunk with
# this executable and threads it through every per-stage decode.
build_words_table = jax.jit(lambda stream: _words_table(stream)[0])


def _dec_sym(x, p, v, word, boff):
    """One rANS bit decode + renorm off a prefetched 4-byte ``word``;
    ``boff`` (u32) is the symbol's first byte's offset in the word.
    Returns (x', bytes_used, bit)."""
    f1 = freq1_from_prob(p, v)
    f0 = jnp.asarray(PROB_SCALE, U32) - f1
    slot = x & jnp.asarray(PROB_SCALE - 1, U32)
    bit = slot >= f0
    f = jnp.where(bit, f1, f0)
    c = jnp.where(bit, f0, jnp.asarray(0, U32))
    x = f * (x >> 16) + slot - c
    b0 = (word >> (boff * 8)) & jnp.asarray(0xFF, U32)
    n0 = (x < jnp.asarray(RANS_L, U32)).astype(U32)
    x = jnp.where(n0 > 0, (x << 8) | b0, x)
    b1 = (word >> ((boff + n0) * 8)) & jnp.asarray(0xFF, U32)
    n1 = (x < jnp.asarray(RANS_L, U32)).astype(U32)
    x = jnp.where(n1 > 0, (x << 8) | b1, x)
    return x, n0 + n1, bit


# Per-lane read-ahead window, in u32 words.  The per-step u32 gather's
# cost scales with the GATHERED OPERAND'S SIZE on TPU (measured: a
# level-0 segment decodes in 144 ms against an 8 MB stream argument vs
# 1338 ms against 32 MB — same content; scripts/prof_dev_codec.py), so
# reading the big words table every step is the decode's real cost at
# production stream sizes.  Each scan step consumes <= 4 bytes per lane
# (2 symbols x <= 2 renorm bytes); a (LANES, W) window refilled by ONE
# big-table gather serves W-1 steps of small (LANES, W)-operand reads —
# W-1 = 15x fewer big gathers, wire-identical.
DEC_WINDOW_W = 16


def _decode_core(states, cursors, words, w, probs, valid):
    """Shared decode body over a (4w,) u32 words table (see
    _words_table / build_words_table).  TWO symbols per scan step off
    ONE u32 window read, with the table gathered into a per-lane
    (W-word) read-ahead window once per W-1 steps (DEC_WINDOW_W; the
    per-step read then touches a 64 KB operand instead of the whole
    table).  NO symbol padding is introduced anywhere: pad symbols are
    REAL coded symbols (f1 = 1), so the windowed blocks cover
    floor(pairs / (W-1)) blocks and the leftover pairs run the per-step
    big-table path."""
    n = probs.shape[0]
    steps = n // LANES
    pairs, tail = steps // 2, steps % 2
    W = DEC_WINDOW_W
    R = W - 1

    def window(cur):
        idx = (cur & 3) * w + (cur >> 2)
        return jnp.take(words, idx, mode="clip")

    def step_pair(x, rel_word, p, v):
        """One step-pair off a 4-byte window ``rel_word`` at the pair's
        first byte; returns (x', bytes_used, (2, LANES) bits)."""
        x, used0, bit0 = _dec_sym(
            x, p[0], v[0], rel_word, jnp.zeros_like(x, U32)
        )
        x, used1, bit1 = _dec_sym(x, p[1], v[1], rel_word, used0)
        out = jnp.stack(
            [jnp.where(v[0], bit0, False).astype(U8),
             jnp.where(v[1], bit1, False).astype(U8)], 0)
        return x, used0 + used1, out

    def body(carry, inp):
        x, cur = carry
        p, v = inp
        x, used, out = step_pair(x, window(cur), p, v)
        return (x, cur + used.astype(jnp.int32)), out

    x, cur = states, cursors
    blocks = pairs // R
    rem = pairs - blocks * R
    bits_parts = []
    if blocks:
        def blk_body(carry, inp):
            x, cur = carry
            p, v = inp  # (R, 2, LANES)
            idx0 = (cur & 3) * w + (cur >> 2)
            win = jnp.take(
                words, idx0[:, None] + jnp.arange(W, dtype=jnp.int32)[None],
                mode="clip",
            )  # (LANES, W) u32, bytes cur .. cur + 4W - 1 per lane

            def inner(c2, pv):
                x, rel = c2
                pp, vv = pv
                wi = (rel >> 2).astype(jnp.int32)
                sh = (rel & 3) * 8
                w0 = jnp.take_along_axis(win, wi[:, None], axis=1)[:, 0]
                w1 = jnp.take_along_axis(
                    win, jnp.minimum(wi + 1, W - 1)[:, None], axis=1
                )[:, 0]
                word = jnp.where(
                    sh == 0, w0, (w0 >> sh) | (w1 << (32 - sh))
                )
                x, used, out = step_pair(x, word, pp, vv)
                return (x, rel + used), out

            (x, rel), out = jax.lax.scan(
                inner, (x, jnp.zeros((LANES,), U32)), (p, v)
            )
            return (x, cur + rel.astype(jnp.int32)), out

        pr = probs[: 2 * blocks * R * LANES].reshape(blocks, R, 2, LANES)
        vd = valid[: 2 * blocks * R * LANES].reshape(blocks, R, 2, LANES)
        (x, cur), bits_b = jax.lax.scan(blk_body, (x, cur), (pr, vd))
        bits_parts.append(bits_b.reshape(-1))
    if rem:
        a = 2 * blocks * R * LANES
        pr = probs[a: a + 2 * rem * LANES].reshape(rem, 2, LANES)
        vd = valid[a: a + 2 * rem * LANES].reshape(rem, 2, LANES)
        (x, cur), bits_r = jax.lax.scan(body, (x, cur), (pr, vd))
        bits_parts.append(bits_r.reshape(-1))
    if tail:
        p = probs[2 * pairs * LANES:].reshape(LANES)
        v = valid[2 * pairs * LANES:].reshape(LANES)
        x, used, bit = _dec_sym(
            x, p, v, window(cur), jnp.zeros_like(cur, U32)
        )
        cur = cur + used.astype(jnp.int32)
        bits_parts.append(jnp.where(v, bit, False).astype(U8))
    bits = (
        jnp.concatenate(bits_parts)
        if bits_parts
        else jnp.zeros((0,), U8)
    )
    return x, cur, bits


@jax.jit
def rans_decode_segment(states, cursors, stream, probs, valid):
    """Decode one segment's bits on device.

    states (LANES,) u32, cursors (LANES,) i32 absolute byte positions
    into ``stream`` (B,) u8 (zero-padded), probs (N,) float P(bit=1)
    with N % LANES == 0, valid (N,) bool.  Returns (states', cursors',
    bits (N,) u8) — pad symbols decode to 0.  Wire-identical to (and
    bit-cross-tested against) the numpy twin — only the read mechanics
    differ.

    NOTE: builds the words table IN-executable — convenient for tests
    and one-shot segments, but the table then re-stages into VMEM per
    scan step (cost ~ stream size x steps; see build_words_table).  The
    production codec uses rans_decode_segment_tbl with a chunk-wide
    prebuilt table instead.
    """
    words, w = _words_table(stream)
    return _decode_core(states, cursors, words, w, probs, valid)


@jax.jit
def rans_decode_segment_tbl(states, cursors, words, probs, valid):
    """Decode one segment against a PREBUILT (4w,) u32 words table
    (build_words_table) passed as an argument — the table stays in HBM
    and decode time is independent of the stream size (30 ms for a
    level-0 segment at an 8 MB OR a 32 MB stream vs 144/1338 ms with
    the in-executable table)."""
    w = words.shape[0] // 4
    return _decode_core(states, cursors, words, w, probs, valid)


# ------------------------------------------------------- device: encode ----


@jax.jit
def rans_encode_segment(states, probs, bits, valid):
    """Encode one segment in reverse symbol order on device.

    Returns (states', slot_bytes (steps, LANES, 2) u8, slot_mask
    (steps, LANES, 2) bool): slot [..., 0] is the later-emitted (first-
    read) byte, [..., 1] the earlier — ascending decode order is exactly
    slots read t = 0..steps-1, slot 0 then 1.

    NOTE: segments must be encoded in REVERSE decode order (the state
    chain is LIFO); the caller feeds the last decode segment first.
    """
    n = probs.shape[0]
    steps = n // LANES
    pr = probs.reshape(steps, LANES)
    bt = bits.reshape(steps, LANES)
    vd = valid.reshape(steps, LANES)

    def body(x, inp):
        p, b, v = inp
        f1 = freq1_from_prob(p, v)
        f0 = jnp.asarray(PROB_SCALE, U32) - f1
        bit = jnp.where(v, b.astype(jnp.bool_), False)
        f = jnp.where(bit, f1, f0)
        c = jnp.where(bit, f0, jnp.asarray(0, U32))
        # renorm-emit: low byte first; decoder reads the pair in reverse
        e0 = x >= (f << 15)
        b0 = (x & jnp.asarray(0xFF, U32)).astype(U8)
        x = jnp.where(e0, x >> 8, x)
        e1 = x >= (f << 15)
        b1 = (x & jnp.asarray(0xFF, U32)).astype(U8)
        x = jnp.where(e1, x >> 8, x)
        x = ((x // f) << 16) + (x % f) + c
        byts = jnp.stack([b1, b0], axis=-1)          # first-read first
        mask = jnp.stack([e1, e0], axis=-1)
        return x, (byts, mask)

    states, (byts, mask) = jax.lax.scan(
        body, states, (pr, bt, vd), reverse=True
    )
    return states, byts, mask


@partial(jax.jit, static_argnames=("out_bucket",))
def rans_compact_emissions(byts, mask, out_bucket: int):
    """Per-lane compaction of one or more stacked segments' emissions.

    byts/mask (K, LANES, 2) in ascending decode order (segments
    concatenated in decode order along K).  Returns (lane_len (LANES,)
    i32, out (LANES, out_bucket) u8) where out[l, :lane_len[l]] is lane
    l's byte stream in decode-read order.
    """
    k = byts.shape[0]
    b2 = byts.transpose(1, 0, 2).reshape(LANES, k * 2)
    m2 = mask.transpose(1, 0, 2).reshape(LANES, k * 2)
    pos = jnp.cumsum(m2.astype(jnp.int32), axis=1) - m2.astype(jnp.int32)
    lane_len = jnp.sum(m2.astype(jnp.int32), axis=1)
    out = jnp.zeros((LANES, out_bucket), U8)
    lane_idx = jnp.broadcast_to(
        jnp.arange(LANES, dtype=jnp.int32)[:, None], pos.shape
    )
    tgt = jnp.where(m2, pos, out_bucket)  # drop non-emissions
    out = out.at[lane_idx.reshape(-1), tgt.reshape(-1)].set(
        b2.reshape(-1), mode="drop"
    )
    return lane_len, out


def rans_initial_states():
    return jnp.full((LANES,), RANS_L, U32)


# --------------------------------------------------------- host twin (np) --


def np_rans_encode(seg_probs, seg_bits, seg_valid):
    """Host-reference encoder over a LIST of segments in DECODE order.

    Each segment: probs (N,) f32 (N % LANES == 0), bits (N,) u8,
    valid (N,) bool.  Returns (states (LANES,) u32, lane_streams: list of
    LANES bytes objects in decode-read order).
    """
    x = np.full(LANES, RANS_L, np.uint64)
    # emissions collected per lane in ENCODE order
    enc_bytes = [[] for _ in range(LANES)]
    for probs, bits, valid in reversed(list(zip(seg_probs, seg_bits, seg_valid))):
        n = len(probs)
        assert n % LANES == 0
        steps = n // LANES
        pr = np.asarray(probs, np.float32).reshape(steps, LANES)
        bt = np.asarray(bits).reshape(steps, LANES)
        vd = np.asarray(valid).reshape(steps, LANES)
        for t in reversed(range(steps)):
            f1 = np_freq1_from_prob(pr[t], vd[t]).astype(np.uint64)
            f0 = PROB_SCALE - f1
            bit = np.where(vd[t], bt[t].astype(bool), False)
            f = np.where(bit, f1, f0)
            c = np.where(bit, f0, 0)
            for _ in range(2):
                emit = x >= (f << 15)
                for l in np.nonzero(emit)[0]:
                    enc_bytes[l].append(int(x[l] & 0xFF))
                x = np.where(emit, x >> 8, x)
            x = ((x // f) << 16) + (x % f) + c
    streams = [bytes(reversed(eb)) for eb in enc_bytes]
    return x.astype(np.uint32), streams


def np_rans_decode(states, lane_streams, seg_probs, seg_valid):
    """Host-reference decoder; returns (bits per segment, final states)."""
    x = states.astype(np.uint64).copy()
    cur = np.zeros(LANES, np.int64)
    buf = [np.frombuffer(s, np.uint8) for s in lane_streams]
    out = []
    for probs, valid in zip(seg_probs, seg_valid):
        n = len(probs)
        steps = n // LANES
        pr = np.asarray(probs, np.float32).reshape(steps, LANES)
        vd = np.asarray(valid).reshape(steps, LANES)
        bits = np.zeros((steps, LANES), np.uint8)
        for t in range(steps):
            f1 = np_freq1_from_prob(pr[t], vd[t]).astype(np.uint64)
            f0 = PROB_SCALE - f1
            slot = x & (PROB_SCALE - 1)
            bit = slot >= f0
            f = np.where(bit, f1, f0)
            c = np.where(bit, f0, 0)
            x = f * (x >> 16) + slot - c
            for _ in range(2):
                need = x < RANS_L
                for l in np.nonzero(need)[0]:
                    b = buf[l][cur[l]] if cur[l] < len(buf[l]) else 0
                    x[l] = (x[l] << 8) | b
                    cur[l] += 1
            bits[t] = np.where(vd[t], bit, False)
        out.append(bits.reshape(n))
    return out, x.astype(np.uint32)


# ------------------------------------------------------------ blob format --


_V2_FLAG = np.uint32(0x80000000)  # high bit of the LANES word = has CRC32


def pack_rans_blob_flat(states: np.ndarray, payload: np.ndarray,
                        lane_lens: np.ndarray) -> bytes:
    """pack_rans_blob for an already lane-major-concatenated (B,) u8
    payload (lane l's stream = payload[sum(lane_lens[:l]) :][: lane_lens[l]])
    — the vectorized encoder assembles that layout directly without
    materializing 1024 intermediate bytes objects.  Byte-identical blob."""
    import zlib

    head = [np.asarray([LANES | int(_V2_FLAG)], np.uint32).tobytes()]
    head.append(
        np.asarray([zlib.crc32(payload.tobytes()) & 0xFFFFFFFF],
                   np.uint32).tobytes()
    )
    head.append(np.asarray(states, np.uint32).tobytes())
    head.append(np.asarray(lane_lens, np.uint32).tobytes())
    return b"".join(head) + payload.tobytes()


def pack_rans_blob(states: np.ndarray, lane_streams: list[bytes]) -> bytes:
    """rans-v2 chunk blob: u32 (LANES | 0x80000000) | u32 crc32(streams) |
    LANES x u32 state | LANES x u32 length | concatenated lane streams.

    The CRC covers the concatenated lane streams: a corrupted stream would
    otherwise decode SILENTLY on device (clip-mode reads cross into the
    next lane's bytes) and only surface at the frame_points backstop, far
    from the corruption site (round-3 advisor).  v1 blobs (no flag bit,
    no CRC) are still readable."""
    import zlib

    payload = b"".join(lane_streams)
    head = [np.asarray([LANES | int(_V2_FLAG)], np.uint32).tobytes()]
    head.append(
        np.asarray([zlib.crc32(payload) & 0xFFFFFFFF], np.uint32).tobytes()
    )
    head.append(np.asarray(states, np.uint32).tobytes())
    head.append(
        np.asarray([len(s) for s in lane_streams], np.uint32).tobytes()
    )
    return b"".join(head) + payload


def unpack_rans_blob(blob: bytes):
    """-> (states (LANES,) u32, flat stream (B,) u8, lane byte offsets
    (LANES,) i64 into the flat stream).  Verifies the v2 CRC loudly."""
    import zlib

    word0 = int(np.frombuffer(blob[:4], np.uint32)[0])
    has_crc = bool(word0 & int(_V2_FLAG))
    lanes = word0 & ~int(_V2_FLAG)
    if lanes != LANES:
        raise ValueError(
            f"rans blob was written with {lanes} lanes; this build decodes "
            f"{LANES} (the lane count is a wire-format constant — re-encode "
            "the stream)"
        )
    off = 4
    crc_stored = None
    if has_crc:
        crc_stored = int(np.frombuffer(blob[off: off + 4], np.uint32)[0])
        off += 4
    states = np.frombuffer(blob[off: off + 4 * LANES], np.uint32).copy()
    off += 4 * LANES
    lens = np.frombuffer(blob[off: off + 4 * LANES], np.uint32).astype(np.int64)
    off += 4 * LANES
    flat = np.frombuffer(blob[off:], np.uint8)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    assert len(flat) == int(lens.sum()), (len(flat), int(lens.sum()))
    if crc_stored is not None:
        crc = zlib.crc32(flat.tobytes()) & 0xFFFFFFFF
        if crc != crc_stored:
            raise ValueError(
                f"rans blob CRC mismatch: stored {crc_stored:#010x}, "
                f"computed {crc:#010x} — corrupted lane streams"
            )
    # one sentinel byte so clip-mode reads past the end (and fully empty
    # streams — every lane can fit in its 32-bit state) stay in bounds
    flat = np.concatenate([flat, np.zeros(1, np.uint8)])
    return states, flat, offs
