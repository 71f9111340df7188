"""Microbench: device rANS segment decode/encode cost vs scan unroll.

The rANS scans are the codec's only sequential device work (N/LANES
steps per segment; ops/rans.py).  Round-4 sync attribution measured
decode at 0.88 s/frame — plausibly scan-ITERATION-overhead bound, not
compute bound (each step is elementwise u32 VPU work on 1024 lanes plus
two 1024-row byte gathers).  `lax.scan(unroll=U)` trades iterations for
body size with NO wire change — this script measures the curve so the
production value (ops/rans.py RANS_UNROLL) is evidence, not taste.

Usage: python scripts/prof_rans.py [--n 1048576] [--reps 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20,
                    help="symbols per segment (level-0 stage segment scale)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--lanes", type=int, default=0,
                    help="override ops.rans.LANES (wire-format change; "
                         "0 = keep the production value)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from linr_pcgc_tpu.ops import rans as R

    if args.lanes:
        R.LANES = args.lanes  # before any trace; jit retraces on shapes

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    n = args.n
    probs = rng.uniform(0.02, 0.98, n).astype(np.float16).astype(np.float32)
    bits = (rng.uniform(size=n) < probs).astype(np.uint8)
    valid = np.ones(n, bool)

    # encode once with the production path to get a real stream
    st = jnp.full((R.LANES,), R.RANS_L, jnp.uint32)
    st, byts, mask = R.rans_encode_segment(
        st, jnp.asarray(probs), jnp.asarray(bits), jnp.asarray(valid)
    )
    states0 = np.asarray(st)
    cap = int(np.asarray(jnp.sum(mask, axis=(0, 2))).max()) + 8
    lane_len, out = R.rans_compact_emissions(byts, mask, cap)
    lane_len, out = np.asarray(lane_len), np.asarray(out)
    lane_streams = [out[l, : lane_len[l]].tobytes() for l in range(R.LANES)]
    blob = R.pack_rans_blob(states0, lane_streams)
    states, flat, offs = R.unpack_rans_blob(blob)

    def timed(fn, *a):
        o = fn(*a)
        jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(args.reps):
            o = fn(*a)
        jax.block_until_ready(o)
        return (time.time() - t0) / args.reps

    def make_dec(unroll):
        @jax.jit
        def dec(states, cursors, stream, probs, valid):
            steps = probs.shape[0] // R.LANES
            pr = probs.reshape(steps, R.LANES)
            vd = valid.reshape(steps, R.LANES)

            def body(carry, inp):
                x, cur = carry
                p, v = inp
                f1 = R.freq1_from_prob(p, v)
                f0 = jnp.asarray(R.PROB_SCALE, R.U32) - f1
                slot = x & jnp.asarray(R.PROB_SCALE - 1, R.U32)
                bit = slot >= f0
                f = jnp.where(bit, f1, f0)
                c = jnp.where(bit, f0, jnp.asarray(0, R.U32))
                x = f * (x >> 16) + slot - c
                for _ in range(2):
                    need = x < jnp.asarray(R.RANS_L, R.U32)
                    byte = jnp.take(stream, cur, mode="clip").astype(R.U32)
                    x = jnp.where(need, (x << 8) | byte, x)
                    cur = cur + need.astype(jnp.int32)
                out = jnp.where(v, bit, False).astype(R.U8)
                return (x, cur), out

            (states, cursors), bits = jax.lax.scan(
                body, (states, cursors), (pr, vd), unroll=unroll
            )
            return states, cursors, bits.reshape(-1)

        return dec

    def make_dec_prefetch(unroll):
        """Wire-identical decode with ONE 2-byte gather per step: the
        baseline's two renorm reads are DEPENDENT gathers (the second
        read's index needs the first's outcome), so the scan is a
        latency chain of 2 x steps gathers; prefetching stream[cur] and
        stream[cur+1] in one gather halves the chain."""

        @jax.jit
        def dec(states, cursors, stream, probs, valid):
            steps = probs.shape[0] // R.LANES
            pr = probs.reshape(steps, R.LANES)
            vd = valid.reshape(steps, R.LANES)

            def body(carry, inp):
                x, cur = carry
                p, v = inp
                f1 = R.freq1_from_prob(p, v)
                f0 = jnp.asarray(R.PROB_SCALE, R.U32) - f1
                slot = x & jnp.asarray(R.PROB_SCALE - 1, R.U32)
                bit = slot >= f0
                f = jnp.where(bit, f1, f0)
                c = jnp.where(bit, f0, jnp.asarray(0, R.U32))
                x = f * (x >> 16) + slot - c
                two = jnp.take(
                    stream, jnp.stack([cur, cur + 1], 0), mode="clip"
                ).astype(R.U32)  # (2, LANES) ONE gather
                n0 = (x < jnp.asarray(R.RANS_L, R.U32)).astype(R.U32)
                x = jnp.where(n0 > 0, (x << 8) | two[0], x)
                n1 = (x < jnp.asarray(R.RANS_L, R.U32)).astype(R.U32)
                x = jnp.where(n1 > 0, (x << 8) | two[1], x)
                cur = cur + (n0 + n1).astype(jnp.int32)
                out = jnp.where(v, bit, False).astype(R.U8)
                return (x, cur), out

            (states, cursors), bits = jax.lax.scan(
                body, (states, cursors), (pr, vd), unroll=unroll
            )
            return states, cursors, bits.reshape(-1)

        return dec

    def make_dec_prefetch2sym(unroll):
        """Two symbols per scan step off ONE 4-byte prefetch (indices
        cur..cur+3; the second symbol's renorm bytes are selected from
        the prefetched window by the first symbol's consumption count —
        a (LANES, 4) take_along_axis, not a stream gather)."""

        @jax.jit
        def dec(states, cursors, stream, probs, valid):
            steps = probs.shape[0] // R.LANES
            assert steps % 2 == 0
            pr = probs.reshape(steps // 2, 2, R.LANES)
            vd = valid.reshape(steps // 2, 2, R.LANES)

            def one_sym(x, p, v, b0, b1):
                f1 = R.freq1_from_prob(p, v)
                f0 = jnp.asarray(R.PROB_SCALE, R.U32) - f1
                slot = x & jnp.asarray(R.PROB_SCALE - 1, R.U32)
                bit = slot >= f0
                f = jnp.where(bit, f1, f0)
                c = jnp.where(bit, f0, jnp.asarray(0, R.U32))
                x = f * (x >> 16) + slot - c
                n0 = (x < jnp.asarray(R.RANS_L, R.U32)).astype(R.U32)
                x = jnp.where(n0 > 0, (x << 8) | b0, x)
                n1 = (x < jnp.asarray(R.RANS_L, R.U32)).astype(R.U32)
                x = jnp.where(n1 > 0, (x << 8) | b1, x)
                return x, n0 + n1, bit

            def body(carry, inp):
                x, cur = carry
                p, v = inp
                win = jnp.take(
                    stream,
                    cur[None, :] + jnp.arange(4, dtype=jnp.int32)[:, None],
                    mode="clip",
                ).astype(R.U32)  # (4, LANES) ONE gather
                x, used0, bit0 = one_sym(x, p[0], v[0], win[0], win[1])
                # second symbol's bytes: window rows used0, used0+1
                i0 = used0
                b0 = jnp.take_along_axis(win, i0[None, :], axis=0)[0]
                b1 = jnp.take_along_axis(win, i0[None, :] + 1, axis=0)[0]
                x, used1, bit1 = one_sym(x, p[1], v[1], b0, b1)
                cur = cur + (used0 + used1).astype(jnp.int32)
                out = jnp.stack(
                    [jnp.where(v[0], bit0, False).astype(R.U8),
                     jnp.where(v[1], bit1, False).astype(R.U8)], 0)
                return (x, cur), out

            (states, cursors), bits = jax.lax.scan(
                body, (states, cursors), (pr, vd), unroll=unroll
            )
            return states, cursors, bits.reshape(-1)

        return dec

    def make_dec_u32x2(unroll):
        """Two symbols per scan step off ONE single-index u32 gather.

        The flat unroll/prefetch curves say the decode scan is gather
        INDEX-THROUGHPUT bound (baseline and pf2 issue the same 2
        indices/symbol and cost the same).  This variant gathers one
        u32 (4 bytes, the max 2 symbols can consume) per step from a
        (4, W) table of byte-shifted u32 repacks of the stream —
        selected by cur & 3, word cur >> 2, ONE flat index — and slices
        the second symbol's bytes out of the word with a per-lane
        dynamic right-shift (vector op, no second gather).  Index
        count: 0.5/symbol vs baseline 2."""

        @jax.jit
        def dec(states, cursors, stream, probs, valid):
            steps = probs.shape[0] // R.LANES
            assert steps % 2 == 0
            pr = probs.reshape(steps // 2, 2, R.LANES)
            vd = valid.reshape(steps // 2, 2, R.LANES)
            # 4 byte-shifted u32 views, little-endian: words[k, i] =
            # stream[4i+k] | stream[4i+k+1]<<8 | ...
            w = (stream.shape[0] + 3) // 4  # ceil: cover the tail bytes
            s32 = jnp.concatenate(
                [stream, jnp.zeros((4 * w + 4 - stream.shape[0],), R.U8)]
            ).astype(jnp.uint32)
            words = jnp.stack(
                [
                    s32[k: k + 4 * w: 4]
                    | (s32[k + 1: k + 1 + 4 * w: 4] << 8)
                    | (s32[k + 2: k + 2 + 4 * w: 4] << 16)
                    | (s32[k + 3: k + 3 + 4 * w: 4] << 24)
                    for k in range(4)
                ],
                0,
            ).reshape(-1)  # (4 * w,) flat; index = (c & 3) * w + (c >> 2)

            def one_sym(x, p, v, word, boff):
                f1 = R.freq1_from_prob(p, v)
                f0 = jnp.asarray(R.PROB_SCALE, R.U32) - f1
                slot = x & jnp.asarray(R.PROB_SCALE - 1, R.U32)
                bit = slot >= f0
                f = jnp.where(bit, f1, f0)
                c = jnp.where(bit, f0, jnp.asarray(0, R.U32))
                x = f * (x >> 16) + slot - c
                b0 = (word >> (boff * 8)) & 0xFF
                n0 = (x < jnp.asarray(R.RANS_L, R.U32)).astype(R.U32)
                x = jnp.where(n0 > 0, (x << 8) | b0, x)
                b1 = (word >> ((boff + n0) * 8)) & 0xFF
                n1 = (x < jnp.asarray(R.RANS_L, R.U32)).astype(R.U32)
                x = jnp.where(n1 > 0, (x << 8) | b1, x)
                return x, n0 + n1, bit

            def body(carry, inp):
                x, cur = carry
                p, v = inp
                idx = (cur & 3) * w + (cur >> 2)
                word = jnp.take(words, idx, mode="clip")  # ONE gather
                x, used0, bit0 = one_sym(
                    x, p[0], v[0], word, jnp.zeros_like(cur, R.U32)
                )
                x, used1, bit1 = one_sym(x, p[1], v[1], word, used0)
                cur = cur + (used0 + used1).astype(jnp.int32)
                out = jnp.stack(
                    [jnp.where(v[0], bit0, False).astype(R.U8),
                     jnp.where(v[1], bit1, False).astype(R.U8)], 0)
                return (x, cur), out

            (states, cursors), bits = jax.lax.scan(
                body, (states, cursors), (pr, vd), unroll=unroll
            )
            return states, cursors, bits.reshape(-1)

        return dec

    def make_dec_u32xk(ksym, unroll):
        """K symbols per scan step off ONE (K/2, LANES)-index u32
        gather (window of 2K bytes, the max K symbols consume).  Byte
        at dynamic window offset o = word[o >> 2] >> ((o & 3) * 8),
        the word selected by a static where-chain — vector ops only."""
        kw = ksym // 2  # words per step

        @jax.jit
        def dec(states, cursors, stream, probs, valid):
            steps = probs.shape[0] // R.LANES
            assert steps % ksym == 0
            pr = probs.reshape(steps // ksym, ksym, R.LANES)
            vd = valid.reshape(steps // ksym, ksym, R.LANES)
            w = (stream.shape[0] + 3) // 4
            s32 = jnp.concatenate(
                [stream, jnp.zeros((4 * w + 4 - stream.shape[0],), R.U8)]
            ).astype(jnp.uint32)
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

            def byte_at(win, o):
                # win: (kw, LANES) u32; o: (LANES,) u32 in [0, 4*kw)
                sh = (o & 3) * 8
                b = (win[0] >> sh) & 0xFF
                for j in range(1, kw):
                    b = jnp.where((o >> 2) == j, (win[j] >> sh) & 0xFF, b)
                return b

            def one_sym(x, p, v, win, boff):
                f1 = R.freq1_from_prob(p, v)
                f0 = jnp.asarray(R.PROB_SCALE, R.U32) - f1
                slot = x & jnp.asarray(R.PROB_SCALE - 1, R.U32)
                bit = slot >= f0
                f = jnp.where(bit, f1, f0)
                c = jnp.where(bit, f0, jnp.asarray(0, R.U32))
                x = f * (x >> 16) + slot - c
                b0 = byte_at(win, boff)
                n0 = (x < jnp.asarray(R.RANS_L, R.U32)).astype(R.U32)
                x = jnp.where(n0 > 0, (x << 8) | b0, x)
                b1 = byte_at(win, boff + n0)
                n1 = (x < jnp.asarray(R.RANS_L, R.U32)).astype(R.U32)
                x = jnp.where(n1 > 0, (x << 8) | b1, x)
                return x, n0 + n1, bit

            def body(carry, inp):
                x, cur = carry
                p, v = inp
                base = cur[None, :] + 4 * jnp.arange(
                    kw, dtype=jnp.int32)[:, None]
                idx = (base & 3) * w + (base >> 2)
                win = jnp.take(words, idx, mode="clip")  # (kw, LANES)
                boff = jnp.zeros_like(cur, R.U32)
                outs = []
                for t in range(ksym):
                    x, used, bit = one_sym(x, p[t], v[t], win, boff)
                    boff = boff + used
                    outs.append(jnp.where(v[t], bit, False).astype(R.U8))
                cur = cur + boff.astype(jnp.int32)
                return (x, cur), jnp.stack(outs, 0)

            (states, cursors), bits = jax.lax.scan(
                body, (states, cursors), (pr, vd), unroll=unroll
            )
            return states, cursors, bits.reshape(-1)

        return dec

    def make_gather_only():
        """Calibration: the decode scan's gathers ALONE (dependent
        cursor chain, no rANS math) — is the scan gather-bound?"""

        @jax.jit
        def dec(states, cursors, stream, probs, valid):
            steps = probs.shape[0] // R.LANES
            pr = probs.reshape(steps, R.LANES)

            def body(carry, p):
                x, cur = carry
                byte = jnp.take(stream, cur, mode="clip").astype(R.U32)
                byte2 = jnp.take(stream, cur + 1, mode="clip").astype(R.U32)
                x = x ^ (byte + byte2)
                cur = cur + (x & 1).astype(jnp.int32)
                return (x, cur), (x & 1).astype(R.U8)

            (states, cursors), bits = jax.lax.scan(
                body, (states, cursors), pr
            )
            return states, cursors, bits.reshape(-1)

        return dec

    cursors = jnp.asarray(offs, jnp.int32)
    stream_d = jnp.asarray(flat)
    probs_d = jnp.asarray(probs)
    valid_d = jnp.asarray(valid)
    states_d = jnp.asarray(states)

    rec = {"n": n, "lanes": int(R.LANES), "dec_ms": {}, "enc_ms": {}}
    t = timed(make_gather_only(), states_d, cursors, stream_d, probs_d,
              valid_d)
    rec["gather_only_ms"] = round(t * 1e3, 2)
    print(f"gather-only scan: {t*1e3:8.2f} ms", flush=True)

    ref_bits = None
    variants = [("u1", make_dec(1))]
    variants += [("u32x2_u1", make_dec_u32x2(1))]
    variants += [
        (f"u32x{k}k_u1", make_dec_u32xk(k, 1)) for k in (2, 4, 8, 16)
    ]
    for name, fn in variants:
        t = timed(fn, states_d, cursors, stream_d, probs_d, valid_d)
        _, _, got = fn(states_d, cursors, stream_d, probs_d, valid_d)
        got = np.asarray(got)
        if ref_bits is None:
            ref_bits = got
            assert (got == bits).all(), "decode != encoded bits"
        else:
            assert (got == ref_bits).all(), f"{name} changed bits"
        rec["dec_ms"][name] = round(t * 1e3, 2)
        print(f"dec {name:10s}: {t*1e3:8.2f} ms", flush=True)

    def make_enc(unroll):
        @jax.jit
        def enc(states, probs, bits, valid):
            steps = probs.shape[0] // R.LANES
            pr = probs.reshape(steps, R.LANES)
            bt = bits.reshape(steps, R.LANES)
            vd = valid.reshape(steps, R.LANES)

            def body(x, inp):
                p, b, v = inp
                f1 = R.freq1_from_prob(p, v)
                f0 = jnp.asarray(R.PROB_SCALE, R.U32) - f1
                b = jnp.where(v, b, 0).astype(bool)
                f = jnp.where(b, f1, f0)
                c = jnp.where(b, f0, jnp.asarray(0, R.U32))
                xmax = (f << 8) * (R.RANS_L >> R.PROB_BITS)
                byts, mask = [], []
                for _ in range(2):
                    over = x >= xmax
                    byts.append((x & 0xFF).astype(R.U8))
                    mask.append(over)
                    x = jnp.where(over, x >> 8, x)
                x = ((x // f) << 16) + (x % f) + c
                return x, (jnp.stack(byts, -1), jnp.stack(mask, -1))

            x, (byts, mask) = jax.lax.scan(
                body, states, (pr, bt, vd), reverse=True, unroll=unroll
            )
            return x, byts, mask

        return enc

    for u in (1, 2, 4, 8, 16):
        fn = make_enc(u)
        t = timed(
            fn, jnp.full((R.LANES,), R.RANS_L, jnp.uint32),
            probs_d, jnp.asarray(bits), valid_d,
        )
        rec["enc_ms"][str(u)] = round(t * 1e3, 2)
        print(f"enc unroll={u:2d}: {t*1e3:8.2f} ms", flush=True)

    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
