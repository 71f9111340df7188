"""Per-executable timing of the device codec's level-0 pieces.

The round-4 phase profile (docs/BENCH_CODEC_r04.json + /tmp runs) showed
decode wall = dec_bits_down (the per-level blocking download absorbing
the whole device backlog) at ~3 s/frame while host dispatch is ~0.06 —
and a chained-dispatch microbench measured launch overhead at ~0.02 ms,
so the backlog is REAL device compute.  This probe times each decode
executable individually at level-0 production shapes (the dominant
level) to find where it goes: brickify, x_glob, the fused cs-wide probs
step, the rANS decode+scatter tail, and the round-4 `_level_scan`
dual-mode executable (whole stage loop in one dispatch, cs=1).

Usage: python scripts/prof_dev_codec.py [--frames 4] [--points 800000]
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
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--points", type=int, default=800000)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from linr_pcgc_tpu.data import synthetic_cloud, PyramidDataset
    from linr_pcgc_tpu.data.dataset import bucket_size
    from linr_pcgc_tpu.models import ModelConfig, init_params
    from linr_pcgc_tpu.runtime import dev_codec as D

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    f = args.frames
    frames = [
        synthetic_cloud(args.points, depth=10, seed=7, phase=0.08 * t)
        for t in range(f)
    ]
    ds = PyramidDataset(frames, handle_dir=None)
    ds[0]
    pyrs = [ds[i] for i in range(f)]
    cfg = ModelConfig(scale_num=ds.scale_num)
    params = init_params(jax.random.PRNGKey(0), cfg)

    s = args.level
    counts = [p.levels[s].n for p in pyrs]
    bv = bucket_size(max(counts))
    coords_np = np.zeros((f, bv, 3), np.int32)
    for i, p in enumerate(pyrs):
        coords_np[i, : p.levels[s].n] = p.levels[s].coords[: p.levels[s].n]
    coords, keys = D._init_level(
        jnp.asarray(coords_np), jnp.asarray(counts, jnp.int32), bv
    )
    shapes = D._LevelShapes(ds.scale_num, [p.low_coords.astype(np.int32) for p in pyrs])
    for lv in range(ds.scale_num - 1, -1, -1):
        shapes.set_counts(lv, [p.levels[lv].n for p in pyrs])
    bv, cap, tv = shapes.buckets(s)
    total = sum(counts)

    def timed(label, fn, *a, reps=args.reps, **kw):
        out = fn(*a, **kw)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a, **kw)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        dt = (time.time() - t0) / reps
        print(f"{label:26s}: {dt*1e3:9.2f} ms", flush=True)
        return out, dt

    rec = {"config": vars(args), "bricks": None, "ms": {}}

    geo, dt = timed(
        "brickify", D._brickify_level, coords, keys,
        jnp.asarray(counts, jnp.int32), jnp.int32(s), cap, tv,
    )
    rec["ms"]["brickify"] = round(dt * 1e3, 2)
    rec["bricks"] = int(geo["code"].shape[0])
    print(f"bricks(FxCap)={geo['code'].shape[0]} bv={bv} tv={tv}", flush=True)

    xg, dt = timed("x_glob", D._dev_ctx, params, cfg, geo["code"], geo["nbr27"], jnp.int32(s))
    rec["ms"]["x_glob"] = round(dt * 1e3, 2)

    occ_buf, vox_occ = D._zero_buffers(f, cap, bv)
    jax.block_until_ready(occ_buf)

    cs = D._fused_cs(geo["code"].shape[0], cfg, D._fused_budget_gb(), D._fused_cs_cap())
    pr2, dt = timed(
        f"fused_probs cs={cs}", D._fused_probs, params, cfg, occ_buf,
        geo["code"], geo["nbr27"], xg, geo["sel"], jnp.int32(0), cs,
    )
    rec["ms"][f"fused_probs_cs{cs}"] = round(dt * 1e3, 2)
    pr = pr2[0]

    # rANS decode+scatter tail on a synthetic stream (timing only)
    from linr_pcgc_tpu.ops import rans as R

    stream = jnp.zeros((bucket_size(4 << 20),), jnp.uint8)
    r_st = R.rans_initial_states()
    r_cur = jnp.zeros((R.LANES,), jnp.int32)
    bits_acc = jnp.zeros((cfg.outstage, tv), jnp.uint8)

    def rans_tail():
        return D._rans_dec_stage_scatter(
            R.rans_initial_states(), jnp.zeros((R.LANES,), jnp.int32),
            stream, pr, geo["vox_fr"], geo["vox_j"], jnp.int32(total),
            jnp.zeros((cfg.outstage, tv), jnp.uint8),
            *D._zero_buffers(f, cap, bv), jnp.int32(0),
            geo["vox_brick"], geo["vox_slot"],
        )

    _, dt = timed("rans_dec_stage_scatter", rans_tail)
    rec["ms"]["rans_dec_stage_scatter"] = round(dt * 1e3, 2)

    # the whole-level scan executable (round-4 negative result), dec mode
    _level_scan, _dummy_stream = _install_level_scan(D)
    cols8 = jnp.zeros((cfg.outstage, f, bv // 8), jnp.uint8)
    cap_stream = _dummy_stream()

    def scan_dec():
        ob, vo = D._zero_buffers(f, cap, bv)
        return _level_scan(
            params, cfg, ob, vo, geo["code"], geo["nbr27"], xg, geo["sel"],
            geo["vox_fr"], geo["vox_j"], jnp.int32(total),
            R.rans_initial_states(), jnp.zeros((R.LANES,), jnp.int32),
            cap_stream, cols8, jnp.bool_(False),
            geo["vox_brick"], geo["vox_slot"],
        )

    t0 = time.time()
    out = scan_dec()
    jax.block_until_ready(out)
    print(f"level_scan compile+run: {time.time()-t0:.1f}s", flush=True)
    _, dt = timed("level_scan (dec mode)", scan_dec)
    rec["ms"]["level_scan_dec"] = round(dt * 1e3, 2)

    def scan_enc():
        ob, vo = D._zero_buffers(f, cap, bv)
        return _level_scan(
            params, cfg, ob, vo, geo["code"], geo["nbr27"], xg, geo["sel"],
            geo["vox_fr"], geo["vox_j"], jnp.int32(total),
            R.rans_initial_states(), jnp.zeros((R.LANES,), jnp.int32),
            cap_stream, cols8, jnp.bool_(True),
            geo["vox_brick"], geo["vox_slot"],
        )

    _, dt = timed("level_scan (enc mode)", scan_enc)
    rec["ms"]["level_scan_enc"] = round(dt * 1e3, 2)

    # today's decode level cost model vs scan mode
    per_level_today = (
        cfg.outstage
        * (rec["ms"][f"fused_probs_cs{cs}"] + rec["ms"]["rans_dec_stage_scatter"])
    )
    print(
        f"\nlevel-{s} decode today: 8x(probs+rans) = {per_level_today:.0f} ms; "
        f"scan mode: {rec['ms']['level_scan_dec']:.0f} ms",
        flush=True,
    )
    if args.out:
        with open(args.out, "w") as fo:
            json.dump(rec, fo, indent=1)
    print(json.dumps(rec), flush=True)


# --------------------------------------------------------------------------
# The round-4 `_level_scan` experiment — MEASURED AND REJECTED, kept here
# for reproducibility (see _probs_mode in runtime/dev_codec.py and
# docs/DESIGN.md).  ONE dual-mode executable for a level's entire stage
# loop: lax.scan over the 8 stages, cs=1 probabilities, lax.cond picking
# ground-truth bits (encode) or the in-scan rANS decode (decode).  It is
# correct by the same bit-exactness discipline as production (same
# executable, f16 convert before the cond) but LOSES on device time:
# launch overhead is ~0.02 ms so there is nothing to save, cs=1 forfeits
# the encoder's halo amortization, and the in-scan entropy decode pays
# gather-cost ~ operand-size on the static stream-cap operand.
# --------------------------------------------------------------------------


def _install_level_scan(D):
    """Define the experimental executable against dev_codec's helpers."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from linr_pcgc_tpu.models import ModelConfig
    from linr_pcgc_tpu.models.network import F32
    from linr_pcgc_tpu.ops.superbricks import unpack_bits
    from linr_pcgc_tpu.ops.rans import rans_decode_segment
    import os

    CDT = D.CDT
    _pack_cols = D._pack_cols

    def _stream_cap() -> int:  # noqa: E302
        """Static shape of the rANS stream argument of `_level_scan`.

        The scan executable fuses the probability chain with the entropy
        decode, so the stream array is an argument of the SAME executable
        both codec sides must dispatch (bit-exactness is per-executable).
        The encoder runs it BEFORE the stream exists — the stream shape must
        therefore be a constant known to both sides, not the blob length:
        the encoder passes a device-side zeros dummy (is_enc=1 never reads
        it), the decoder pads the real stream on DEVICE (upload stays the
        real bytes).  Travels in side_info["numerics"]["stream_cap"]; an
        encode whose chunk blob exceeds the cap fails loudly (encode_gop
        would need a re-encode at a larger cap — at 2 B/symbol worst case
        the default covers ~16M symbols/chunk, ~4x the production bench's
        untrained wire)."""
        return int(os.environ.get("LINR_CODEC_STREAM_CAP", str(1 << 25)))


    _DUMMY_STREAM = {}


    def _dummy_stream():
        """Device-resident zeros stream of the static cap shape (encoder
        side of `_level_scan`; never read under is_enc=1).  Created on
        device (an XLA fill — no host bytes cross the tunnel) and cached per
        cap."""
        cap = _stream_cap()
        d = _DUMMY_STREAM.get(cap)
        if d is None:
            d = _DUMMY_STREAM[cap] = jnp.zeros((cap,), jnp.uint8)
        return d


    @partial(jax.jit, static_argnames=("cap",))
    def _pad_stream_to_cap(stream, cap: int):
        """Bucketed real stream -> the static cap shape, ON device (the
        upload stays the real bytes; recompiles per BUCKET, not per blob)."""
        return jnp.concatenate(
            [stream, jnp.zeros((cap - stream.shape[0],), jnp.uint8)]
        )


    @partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3, 11, 12))
    def _level_scan(params, cfg: ModelConfig, occ_buf, vox_occ, code, nbr27,
                    x_glob, sel, vox_fr, vox_j, total, r_st, r_cur, r_stream,
                    enc_cols8, is_enc, vox_brick, vox_slot):
        """ONE executable for a level's ENTIRE stage loop, both codec sides.

        lax.scan over the 8 stages; each iteration computes stage j's
        probabilities (cs=1 `sb_chunk_logits` — the decoder no longer pays
        the fused executable's discarded stage rows), materializes them as
        f16, then takes stage j's bits from EITHER the ground-truth columns
        (is_enc=1: `lax.cond` skips the entropy decode entirely) OR the
        on-device rANS decode (is_enc=0), and scatters them into the
        occupancy buffers that feed stage j+1 — the autoregressive chain
        with zero inter-stage dispatch boundaries.

        Bit-exactness: stage j's probability value is computed at the SAME
        program point of the SAME executable on both sides, from identical
        inputs (the encoder's ground-truth occupancy == the decoder's
        losslessly decoded occupancy; the tri mask hides channels >= j), and
        the f16 materialization (an explicit convert, preserved by XLA) is
        what both the in-scan entropy decode and the returned ``probs_acc``
        (the encoder's later LIFO rANS sweep input) consume.  The `lax.cond`
        sits strictly AFTER that convert.  ``r_stream`` has the STATIC
        `_stream_cap()` shape on both sides (see there), so the executable
        signature is mode-independent.

        Returns (r_st, r_cur, vox_occ, bits_acc (8, tv) u8, probs_acc
        (8, tv) f16, prev7 (F, Bv/8) packed stage-7 column for the level
        transition).
        """
        from ..models.sb_network import sb_chunk_logits

        f, bv = vox_brick.shape
        cap = occ_buf.shape[0] // f
        tv = sel.shape[0]
        mask = (code >= 0).astype(CDT)[:, None, None, :]
        geom = dict(nbr27=nbr27, mask=mask, code=code, dtype=CDT)
        valid = jnp.arange(tv, dtype=jnp.int32) < total
        fr = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32)[:, None], (f, bv))
        flat_b = jnp.where(
            vox_brick >= 0, fr * cap + vox_brick, f * cap
        ).reshape(-1)
        jv = jnp.broadcast_to(
            jnp.arange(bv, dtype=jnp.int32)[None], (f, bv)
        ).reshape(-1)
        fr_flat = fr.reshape(-1)
        slot_flat = vox_slot.reshape(-1)
        vfr = jnp.where(valid, vox_fr, f)
        vj = jnp.where(valid, vox_j, 0)

        def body(carry, stage):
            occ_buf, vox_occ, st, cur, bits_acc, probs_acc, prev7 = carry
            logits = sb_chunk_logits(
                params, cfg, geom, occ_buf.astype(CDT), stage, 1, x_glob
            )
            pr = jnp.take(
                jax.nn.sigmoid(logits.astype(F32))[:, 0, :].reshape(-1), sel
            ).astype(jnp.float16)

            def enc_branch(_):
                col = jnp.take(enc_cols8, stage, axis=0)  # (F, Bv/8) packed
                gt = unpack_bits(col)[:, :bv][vox_fr, vox_j]
                return st, cur, jnp.where(valid, gt, 0).astype(jnp.uint8)

            def dec_branch(_):
                return rans_decode_segment(st, cur, r_stream, pr, valid)

            st, cur, bits = jax.lax.cond(is_enc, enc_branch, dec_branch, None)
            col = jnp.zeros((f, bv), jnp.uint8).at[vfr, vj].set(
                bits, mode="drop"
            )
            occ_buf = occ_buf.at[
                flat_b, jnp.broadcast_to(stage, flat_b.shape), slot_flat
            ].set(col.reshape(-1), mode="drop")
            vox_occ = vox_occ.at[
                fr_flat, jv, jnp.broadcast_to(stage, (f * bv,))
            ].set(col.reshape(-1), mode="drop")
            bits_acc = jax.lax.dynamic_update_index_in_dim(
                bits_acc, bits, stage, 0
            )
            probs_acc = jax.lax.dynamic_update_index_in_dim(
                probs_acc, pr, stage, 0
            )
            return (occ_buf, vox_occ, st, cur, bits_acc, probs_acc,
                    _pack_cols(col)), None

        carry0 = (
            occ_buf, vox_occ, r_st, r_cur,
            jnp.zeros((cfg.outstage, tv), jnp.uint8),
            jnp.zeros((cfg.outstage, tv), jnp.float16),
            jnp.zeros((f, bv // 8), jnp.uint8),
        )
        (occ_buf, vox_occ, r_st, r_cur, bits_acc, probs_acc, prev7), _ = (
            jax.lax.scan(
                body, carry0, jnp.arange(cfg.outstage, dtype=jnp.int32)
            )
        )
        return r_st, r_cur, vox_occ, bits_acc, probs_acc, prev7


    return _level_scan, _dummy_stream


if __name__ == "__main__":
    main()
