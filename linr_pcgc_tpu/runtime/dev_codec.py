"""Device-resident codec pipeline: geometry derived ON DEVICE.

Round-2's brick codec (runtime/sb_codec.py) rebuilt per-level geometry
host-side on BOTH codec sides (~1 s/frame of numpy each) and uploaded
~11 MB/frame of int32 ``code``/``nbr27`` arrays — measured as the
dominant cost through the dev tunnel (commit 48c72e2).  Here the octree
chain lives on device:

  * both sides upload only the tiny base layer; per level, brick
    structure, neighbor maps and 7-neighbor feature codes are derived
    in-jit from coordinates the device already has
    (ops/superbricks.dev_brickify), and the level transition
    (ops/octree.octree_up) keeps the chain on device;
  * the wire is minimal: per stage, packed occupancy bits go up
    (F * Bv/8 bytes) and per-voxel f16 probabilities come down;
  * encoder/decoder bit-exactness stays by-construction: BOTH sides run
    the SAME jitted ``_stage_step`` executable with identical inputs —
    the encoder feeds ground-truth bits of stage i-1 exactly where the
    decoder feeds AC-decoded bits (which equal them), so every f32
    probability bit coincides.  The encoder never waits on the AC, so
    its 8 stage dispatches pipeline on device.

Shape discipline (XLA static shapes): per-level voxel buckets derive
from counts both sides share — the decoder learns n_vox(level) by
summing decoded occupancy bits, and brick counts need no geometry at
all: a brick coordinate is ``coords >> 2``, so the brick count at level
s IS the voxel count at level s+2 (octree identity), already decoded
when level s is reached.

Reference parity: this is the TPU-native replacement of the reference's
per-frame, per-scale, per-stage CUDA<->CPU ping-pong decode
(/root/reference/models/upsample.py:220-295 CNP.encode/decode,
/root/reference/decoder.py:153-178) — frames stage-synchronous, geometry
device-derived, host touched only by the arithmetic coder.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models import ModelConfig
from ..models.network import F32
from ..data.dataset import bucket_size
from ..ops.coords import KEY_PAD, coord_key
from ..ops.octree import octree_up
from ..ops.superbricks import dev_brickify, unpack_bits

B4 = 4
B4_SLOTS = 64

# Codec compute dtype.  Bit-exactness needs encoder == decoder, NOT any
# particular precision: both sides run the SAME executables, so any
# deterministic dtype works.  bf16 activations/matmuls are ~6x cheaper
# than the f32-HIGHEST default on the MXU and halve the halo HBM
# traffic; the logits/sigmoid/f16-wire stay f32-derived.  Rate impact is
# a slightly blunter probability (measured in docs/RATE_r03.json);
# LINR_CODEC_DTYPE=f32 restores the round-2 behavior.
CDT = jnp.float32 if os.environ.get("LINR_CODEC_DTYPE") == "f32" else jnp.bfloat16

# Frames per device call (deterministic on both sides; the level arrays
# of a 32-frame GOP at level-0 sizes exceed HBM in one batch).
CODEC_FRAME_CHUNK = 8


# LINR_CODEC_PROF=1: accumulate per-phase wall time + wire bytes into
# PROF (printed by scripts/bench_codec.py) — the tunnel/compute split the
# round-2 verdict asked to report separately.
PROF = defaultdict(float)
_PROF_ON = os.environ.get("LINR_CODEC_PROF") == "1"


class _prof:
    def __init__(self, key):
        self.key = key

    def __enter__(self):
        if _PROF_ON:
            self.t0 = time.time()

    def __exit__(self, *a):
        if _PROF_ON:
            PROF[self.key] += time.time() - self.t0


# LINR_CODEC_PROF_SYNC=1: additionally force a device sync after each
# decode-loop executable and attribute the wall time per phase
# (dec_probs / dec_rans).  PERTURBS the measurement — the async chain
# serializes and every sync pays the tunnel's ~30 ms dispatch latency —
# so this is an attribution tool, not a headline-number mode.
_PROF_SYNC = os.environ.get("LINR_CODEC_PROF_SYNC") == "1"


def _sync(x):
    """Block until device value ``x`` is computed (host-read of one
    element — block_until_ready does not block through the axon tunnel)."""
    np.asarray(jnp.ravel(x)[:1])


class _prof_sync:
    """Phase timer that forces a device sync at exit (on ``arr``)."""

    def __init__(self, key):
        self.key = key
        self.arr = None

    def __enter__(self):
        if _PROF_SYNC:
            self.t0 = time.time()
        return self

    def __exit__(self, *a):
        if _PROF_SYNC:
            if self.arr is not None:
                _sync(self.arr)
            PROF[self.key] += time.time() - self.t0


def _frame_chunks(f: int):
    return [
        list(range(a, min(a + CODEC_FRAME_CHUNK, f)))
        for a in range(0, f, CODEC_FRAME_CHUNK)
    ]


def _brick_bucket(n: int) -> int:
    from .sb_overfit import _sb_bucket

    return _sb_bucket(n)


def _lane_bucket(n: int) -> int:
    """~4/octave bucket with 32-byte granularity for per-lane byte
    capacities (encoder-local download shape; not a wire invariant)."""
    if n <= 32:
        return 32
    p = 1 << (int(n - 1).bit_length() - 1)
    step = max(32, p // 4)
    return -(-n // step) * step


# ------------------------------------------------------- jit executables --


@partial(jax.jit, static_argnames=("bucket",))
def _init_level(coords, counts, bucket: int):
    """Base-layer upload -> (F, Bv) device coords + keys."""
    c = coords[:, :bucket]

    def one(cf, n):
        valid = jnp.arange(bucket) < n
        return coord_key(cf, valid)

    return c, jax.vmap(one)(c, counts)


@partial(jax.jit, static_argnames=("brick_cap", "tv_bucket"))
def _brickify_level(coords, keys, counts, scale, brick_cap: int,
                    tv_bucket: int):
    """Per-frame device brickify + flat GOP-batched geometry.

    Returns code (F*cap, slots), nbr27 (F*cap, 27) with frame offsets,
    vox_brick/vox_slot (F, Bv), and the compacted per-voxel flat slot
    index sel (tv_bucket,) in (frame, canonical-voxel) order.
    """
    f, bv = keys.shape

    def one(c, k):
        return dev_brickify(c, k, scale, brick_cap, B4)

    out = jax.vmap(one)(coords, keys)
    return _package_geo(out, counts, f, bv, brick_cap, tv_bucket)


@partial(jax.jit, static_argnames=("brick_cap", "tv_bucket"))
def _brickify_level_gp(coords, keys, counts, scale, parent1, parent2,
                       keys_s2, brick_cap: int, tv_bucket: int):
    """Sort-free brickify: by the octree identity, level-s bricks ARE
    level-(s+2) voxels, so the brick keys are ``keys_s2`` (already
    canonical on device) and a voxel's brick index is its grandparent —
    ``parent2[parent1[v]]`` with the per-child parent maps emitted by
    the level transitions (ops.octree.octree_up_with_parent).  Replaces
    the Nv-row device key sort of ``_brickify_level`` (the codec's
    hottest geometry phase, round-4 sync attribution 0.89 s/frame) with
    two row gathers.

    parent1: (F, Bv_s) level-s voxel -> level-(s+1) row (-1 on pads);
    parent2: (F, Bv_{s+1}) level-(s+1) voxel -> level-(s+2) row;
    keys_s2: (F, Bv_{s+2}) level-(s+2) canonical keys, KEY_PAD-padded.
    """
    from ..ops.superbricks import dev_brickify_geom

    f, bv = keys.shape

    def one(c, k, p1, p2, k2):
        cur = k2.shape[0]
        if cur >= brick_cap:
            k2r = k2[:brick_cap]
        else:
            k2r = jnp.pad(
                k2, (0, brick_cap - cur), constant_values=KEY_PAD
            )
        n_bricks = jnp.sum((k2r != KEY_PAD).astype(jnp.int32))
        g1 = jnp.where(p1 >= 0, p1, p2.shape[0] - 1)
        vb = jnp.where(p1 >= 0, p2[g1], -1)
        return dev_brickify_geom(
            c, k, scale, brick_cap, B4, k2r, n_bricks, vb
        )

    out = jax.vmap(one)(coords, keys, parent1, parent2, keys_s2)
    return _package_geo(out, counts, f, bv, brick_cap, tv_bucket)


@partial(jax.jit, static_argnames=("brick_cap", "tv_bucket"))
def _brickify_level_gp2(coords, keys, counts, scale, parent1, parent2,
                        keys_s2, vb2, sl2, nbr27_pf2, idx_grid2,
                        brick_cap: int, tv_bucket: int):
    """``_brickify_level_gp`` with the nbr27 map ALSO search-free: built
    from the level-(s+2) brickify geometry by pure gathers
    (ops.superbricks.dev_nbr27_from_parent) — no key search of any kind
    remains in this level's geometry (the 27 x cap sorted lookup was
    698 of the gp path's 911 ms at level-0 chunk shapes)."""
    from ..ops.superbricks import dev_brickify_geom, dev_nbr27_from_parent

    f, bv = keys.shape

    def one(c, k, p1, p2, k2, vb2f, sl2f, nbrpf, grid):
        cur = k2.shape[0]
        if cur >= brick_cap:
            k2r = k2[:brick_cap]
        else:
            k2r = jnp.pad(
                k2, (0, brick_cap - cur), constant_values=KEY_PAD
            )
        n_bricks = jnp.sum((k2r != KEY_PAD).astype(jnp.int32))
        g1 = jnp.where(p1 >= 0, p1, p2.shape[0] - 1)
        vb = jnp.where(p1 >= 0, p2[g1], -1)
        nbr27 = dev_nbr27_from_parent(
            vb2f, sl2f, nbrpf, grid, brick_cap, B4
        )
        return dev_brickify_geom(
            c, k, scale, brick_cap, B4, k2r, n_bricks, vb, nbr27
        )

    out = jax.vmap(one)(
        coords, keys, parent1, parent2, keys_s2, vb2, sl2, nbr27_pf2,
        idx_grid2,
    )
    return _package_geo(out, counts, f, bv, brick_cap, tv_bucket)


def _package_geo(out, counts, f, bv, brick_cap: int, tv_bucket: int):
    nbr = out["nbr27"]  # (F, cap, 27)
    off = (jnp.arange(f, dtype=jnp.int32) * brick_cap)[:, None, None]
    nbr_flat = jnp.where(nbr >= 0, nbr + off, -1).reshape(f * brick_cap, 27)
    code_flat = out["code"].reshape(f * brick_cap, -1)

    # compacted per-voxel selector: output position p -> frame r(p),
    # in-frame voxel j(p) = p - offsets[r(p)]
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts.astype(jnp.int32))]
    )
    p = jnp.arange(tv_bucket, dtype=jnp.int32)
    fr = (
        jnp.searchsorted(offs, p, side="right").astype(jnp.int32) - 1
    ).clip(0, f - 1)
    j = (p - offs[fr]).clip(0, bv - 1)
    vb = out["vox_brick"][fr, j]
    vs = out["vox_slot"][fr, j]
    valid = p < offs[f]
    sel = jnp.where(
        valid & (vb >= 0),
        (fr * brick_cap + vb) * B4_SLOTS + vs,
        0,
    )
    # per-frame voxel-index grid: the scatter inverse of (vox_brick,
    # vox_slot) — consumed two levels later by dev_nbr27_from_parent
    vbf = out["vox_brick"]  # (F, Bv)
    vsf = out["vox_slot"]
    jrow = jnp.broadcast_to(
        jnp.arange(bv, dtype=jnp.int32)[None], (f, bv)
    )
    flat_pos = jnp.where(
        vbf >= 0, vbf * B4_SLOTS + vsf, brick_cap * B4_SLOTS
    )
    idx_grid = (
        jnp.full((f, brick_cap * B4_SLOTS), -1, jnp.int32)
        .at[
            jnp.broadcast_to(
                jnp.arange(f, dtype=jnp.int32)[:, None], (f, bv)
            ),
            flat_pos,
        ]
        .set(jrow, mode="drop")
    )
    return dict(
        code=code_flat,
        nbr27=nbr_flat,
        vox_brick=out["vox_brick"],
        vox_slot=out["vox_slot"],
        sel=sel,
        # compacted-position -> (frame, in-frame voxel) maps for the
        # device entropy coder (rANS codes bits in sel order)
        vox_fr=fr,
        vox_j=j,
        # per-frame extras for the search-free nbr27 of level s-2
        nbr27_pf=out["nbr27"],
        idx_grid=idx_grid,
    )


@partial(jax.jit, static_argnames=("cfg",))
def _dev_ctx(params, cfg: ModelConfig, code, nbr27, scale):
    """x_glob with a TRACED scale index (one executable per shape class
    serves every level)."""
    from ..models.sb_network import _sb_block, _sb_mlp2, _stack1

    mask = (code >= 0).astype(CDT)[:, None, None, :]
    geom = dict(nbr27=nbr27, mask=mask, code=code, dtype=CDT)

    bb, slots = code.shape
    feat = code & 127
    bits = jnp.stack(
        [((feat >> k) & 1).astype(CDT) for k in range(cfg.in_channel)],
        axis=-1,
    )  # (Bb, slots, 7)
    bits = bits * mask[:, 0, 0, :, None]
    emb = jnp.take(params["scale_emb"], scale, axis=0).astype(CDT)  # (emb,)
    seg = jnp.concatenate(
        [
            jnp.broadcast_to(emb[None, None, :], (bb, slots, emb.shape[0]))
            * mask[:, 0, 0, :, None],
            bits,
        ],
        axis=-1,
    )[:, None].reshape(bb, 1, slots * (emb.shape[0] + cfg.in_channel))
    tk = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.take(x, scale, axis=0)[None], t
    )
    intensor = _sb_mlp2(
        seg, geom, tk(params["scale_mlp"]["l0"]), tk(params["scale_mlp"]["l1"])
    )
    return _sb_block(intensor, geom, _stack1(params["block_in"]))


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def _stage_step(params, cfg: ModelConfig, occ_buf, vox_occ, code, nbr27,
                x_glob, stage, bits_packed, vox_brick, vox_slot, sel):
    """The per-stage codec executable BOTH sides run.

    1. integer update: scatter stage-1's per-voxel bits into the brick
       occupancy buffer and the per-voxel occupancy (exact, u8);
    2. f32 probability prediction for ``stage`` at the compacted voxels.

    At stage 0 both sides pass zero bits (writing zeros over the zeroed
    column 0 — a no-op), so one executable serves all stages with a
    traced stage index.
    """
    from ..models.sb_network import sb_chunk_logits

    f, bv = vox_brick.shape
    slots = code.shape[-1]
    cap = code.shape[0] // f
    bits = unpack_bits(bits_packed)[:, :bv].astype(jnp.uint8)  # (F, Bv)
    col = jnp.maximum(stage - 1, 0)
    fr = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32)[:, None], (f, bv))
    flat_b = jnp.where(
        vox_brick >= 0, fr * cap + vox_brick, f * cap
    ).reshape(-1)
    occ_buf = occ_buf.at[
        flat_b, jnp.broadcast_to(col, flat_b.shape), vox_slot.reshape(-1)
    ].set(bits.reshape(-1), mode="drop")
    jv = jnp.broadcast_to(
        jnp.arange(bv, dtype=jnp.int32)[None], (f, bv)
    ).reshape(-1)
    vox_occ = vox_occ.at[
        fr.reshape(-1), jv, jnp.broadcast_to(col, (f * bv,))
    ].set(bits.reshape(-1), mode="drop")

    mask = (code >= 0).astype(CDT)[:, None, None, :]
    geom = dict(nbr27=nbr27, mask=mask, code=code, dtype=CDT)
    logits = sb_chunk_logits(
        params, cfg, geom, occ_buf.astype(CDT), stage, 1, x_glob
    )
    pr = jax.nn.sigmoid(logits.astype(F32))[:, 0, :].reshape(-1)
    return occ_buf, vox_occ, jnp.take(pr, sel).astype(jnp.float16)


@partial(jax.jit, donate_argnums=(3, 4))
def _enc_occ_buffers(cols7, vox_brick, vox_slot, occ_buf, vox_occ):
    """ENCODER-ONLY: scatter stage 0..6's ground-truth bit columns into
    the brick occupancy buffer and the per-voxel occupancy in ONE
    executable (the decoder fills these stage-by-stage in _stage_step;
    the encoder knows every stage's bits up front — round-3 verdict next
    #4).  Stage 7's bits never feed a prediction (occ7 = channels 0..6)
    and reach _transition via its own packed column.

    cols7: (7, F, Bv/8) packed; occ_buf (F*cap, 8, 64) and vox_occ
    (F, Bv, 8) are donated zero buffers."""
    f, bv = vox_brick.shape
    cap = occ_buf.shape[0] // f
    fr = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32)[:, None], (f, bv))
    flat_b = jnp.where(
        vox_brick >= 0, fr * cap + vox_brick, f * cap
    ).reshape(-1)
    jv = jnp.broadcast_to(
        jnp.arange(bv, dtype=jnp.int32)[None], (f, bv)
    ).reshape(-1)
    slot_flat = vox_slot.reshape(-1)
    fr_flat = fr.reshape(-1)
    for stage in range(7):
        bits = unpack_bits(cols7[stage])[:, :bv].astype(jnp.uint8).reshape(-1)
        col = jnp.full_like(flat_b, stage)
        occ_buf = occ_buf.at[flat_b, col, slot_flat].set(bits, mode="drop")
        vox_occ = vox_occ.at[fr_flat, jv, col].set(bits, mode="drop")
    return occ_buf, vox_occ


# HBM cap for the fused probability executable.  The stage-batch axis
# scales the context block's halo temporaries LINEARLY (largest: the
# IRN merged conv's (Bb, cs, 216*(ch+ch/2)) bf16 halo concat), and at
# production level-0 shapes cs=8 was measured to need 28.8 GB of HLO
# temp on the 15.75 GB chip (327680 bricks x 8 stages ~ 11 KB per
# brick-stage).  Both codec sides derive the SAME cs from shapes they
# share by construction (bb = frames x brick bucket), and the encoder's
# budget travels in side_info["numerics"]["fused_budget_gb"] so a
# differently-configured decoder still builds identical executables.
_FUSED_TEMP_BYTES_PER_BRICK_STAGE = 11_000  # measured, ch=8, bf16


def _fused_budget_gb() -> float:
    return float(os.environ.get("LINR_FUSED_BUDGET_GB", "8"))


def _fused_cs_cap() -> int:
    """Latency cap on the fused stage-batch width cs, independent of the
    HBM cap: the DECODER re-dispatches the cs-wide executable at every
    stage (autoregressive: stage j's occupancy context only exists after
    stage j-1 decodes) and keeps ONE row, so its per-level probability
    cost is 8 x (halo + cs x stage-work) — monotonically worse in cs —
    while the encoder's is (8/cs) x (halo + cs x stage-work).  The halo
    gather is row-rate bound (cost independent of cs), and on-chip
    chunk costs at the 81920-brick level (docs/SP_MODEL_r04.json:
    186/246/408/812 ms for cs=1/2/4/8) make cs=2 the joint enc+dec
    optimum: enc pays ~2%, dec probs drop ~2.4x vs cs=8.  Travels in
    side_info["numerics"]["fused_cs_cap"]; pre-cap streams decode with
    cap=8 (uncapped)."""
    return int(os.environ.get("LINR_FUSED_CS_CAP", "2"))


def _fused_cs(bb: int, cfg: ModelConfig, budget_gb: float,
              cs_cap: int | None = None) -> int:
    """Largest stage-batch width cs (divisor of outstage) within the
    latency cap whose fused executable fits the HBM budget at ``bb``
    bricks."""
    per = _FUSED_TEMP_BYTES_PER_BRICK_STAGE * max(cfg.ch, 8) / 8.0
    for cs in sorted(
        (d for d in range(1, cfg.outstage + 1) if cfg.outstage % d == 0),
        reverse=True,
    ):
        if cs_cap is not None and cs > cs_cap:
            continue
        if bb * cs * per <= budget_gb * 1e9:
            return cs
    return 1


@partial(jax.jit, static_argnames=("cfg", "cs", "first"))
def _fused_probs(params, cfg: ModelConfig, occ_buf, code, nbr27,
                 x_glob, sel, base, cs: int, first: bool = False):
    """The SHARED stage-batched probability executable
    (probs_mode="fused"): sb_chunk_logits for the ``cs`` stages starting
    at traced ``base`` — the training forward shape.

    Bit-exactness discipline: differently-SHAPED XLA programs are not
    bitwise-interchangeable (a cs=8 and a cs=1 compilation of the same
    math were measured 1 ULP apart on ~0.02% of f16 probabilities —
    reduction orders differ), so BOTH codec sides run THIS executable
    with the SAME static cs (derived from shared shapes, _fused_cs):

      * the encoder fills all ground-truth occupancy columns up front
        (_enc_occ_buffers) and calls it outstage/cs times per level —
        the halo exchange is gather ROW-rate bound (27 x Bb rows
        regardless of the stage-batch width), so one cs-wide pass
        replaces cs serial `_stage_step` dispatches at far less than
        cs x the cost;
      * the decoder calls it once per stage j with base = (j//cs)*cs on
        its PARTIAL occupancy (columns >= j still zero) and keeps row
        j - base only.  That row is bitwise identical to the encoder's
        BY CONSTRUCTION: the in-executable tri mask multiplies occupancy
        channel c by exactly 0.0 for c >= j, so the two calls' row-j
        compute consumes identical values through the identical
        program — equality does not rest on fusion luck across programs.

    ``occ_buf`` is NOT donated: the decoder reuses it across stages.
    Returns (cs, tv) f16 probabilities in compacted voxel order.
    """
    from ..models.sb_network import sb_chunk_logits

    mask = (code >= 0).astype(CDT)[:, None, None, :]
    geom = dict(nbr27=nbr27, mask=mask, code=code, dtype=CDT)
    logits = sb_chunk_logits(
        params, cfg, geom, occ_buf.astype(CDT), base, cs, x_glob, first,
    )  # (Bb, cs, slots)
    pr = jax.nn.sigmoid(logits.astype(F32))
    prs = pr.transpose(1, 0, 2).reshape(cs, -1)
    return jnp.take(prs, sel, axis=1).astype(jnp.float16)


@partial(jax.jit, donate_argnums=(0, 1))
def _scatter_col(occ_buf, vox_occ, bits_packed, col, vox_brick, vox_slot):
    """Scatter one stage's per-voxel bits into occupancy column ``col``
    (traced) of the brick buffer and the per-voxel buffer — the integer
    half of `_stage_step`, split out so the fused-probs decoder can
    update state between `_fused_probs` calls."""
    f, bv = vox_brick.shape
    cap = occ_buf.shape[0] // f
    bits = unpack_bits(bits_packed)[:, :bv].astype(jnp.uint8)
    fr = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32)[:, None], (f, bv))
    flat_b = jnp.where(
        vox_brick >= 0, fr * cap + vox_brick, f * cap
    ).reshape(-1)
    occ_buf = occ_buf.at[
        flat_b, jnp.broadcast_to(col, flat_b.shape), vox_slot.reshape(-1)
    ].set(bits.reshape(-1), mode="drop")
    jv = jnp.broadcast_to(
        jnp.arange(bv, dtype=jnp.int32)[None], (f, bv)
    ).reshape(-1)
    vox_occ = vox_occ.at[
        fr.reshape(-1), jv, jnp.broadcast_to(col, (f * bv,))
    ].set(bits.reshape(-1), mode="drop")
    return occ_buf, vox_occ


def _probs_mode() -> str:
    """Probability-producer selection: "fused" (one cs-wide executable,
    shared by both sides — the default) or "stage" (8 x the cs=1
    `_stage_step` executable, the pre-round-4 wire).  Travels with the
    bitstream in side_info["numerics"]["probs"]; standalone decode adopts
    the encoder's value (runtime/codec.py).

    A third design — the whole per-level stage loop INCLUDING the rANS
    decode as ONE dual-mode lax.scan executable (cs=1, is_enc cond) —
    was built and MEASURED AND REJECTED in round 4: launch overhead
    through the runtime is ~0.02 ms (chained-dispatch microbench), so
    dispatch fusion buys nothing, while cs=1 forfeits the encoder'\''s
    halo amortization (enc level-0 probs 2.1 -> 4.0 s/chunk) and the
    in-scan entropy decode pays the gather-cost-scales-with-operand-size
    law on the static stream-cap operand (a level-0 segment decodes in
    144 ms against an 8 MB stream argument vs 1338 ms against 32 MB —
    same stream CONTENT).  The executable and the measurements live in
    scripts/prof_dev_codec.py; docs/DESIGN.md has the numbers."""
    return os.environ.get("LINR_CODEC_PROBS", "fused")


@partial(jax.jit, static_argnames=("out_bucket",), donate_argnums=(2,))
def _transition(coords, keys, vox_occ, bits7_packed, out_bucket: int):
    """Apply the last stage's bits, then octree-up to the next level's
    bucket.  Returns (coords', keys', parent_idx) — the per-child parent
    ROW index feeds the sort-free brickify two levels later
    (``_brickify_level_gp``)."""
    from ..ops.octree import octree_up_with_parent

    f, bv = keys.shape
    bits = unpack_bits(bits7_packed)[:, :bv].astype(jnp.uint8)
    vox_occ = vox_occ.at[:, :, 7].set(bits)

    def one(c, k, o):
        ch, ck, n, pidx = octree_up_with_parent(c, k, o.astype(jnp.int32))
        return ch, ck, pidx

    ch, ck, pidx = jax.vmap(one)(coords, keys, vox_occ)
    cur = ch.shape[1]
    if cur >= out_bucket:
        ch, ck, pidx = (
            ch[:, :out_bucket], ck[:, :out_bucket], pidx[:, :out_bucket]
        )
    else:
        ch = jnp.pad(ch, ((0, 0), (0, out_bucket - cur), (0, 0)))
        ck = jnp.pad(
            ck, ((0, 0), (0, out_bucket - cur)), constant_values=KEY_PAD
        )
        pidx = jnp.pad(
            pidx, ((0, 0), (0, out_bucket - cur)), constant_values=-1
        )
    return ch, ck, pidx


# ------------------------------------------------- device entropy (rANS) --
#
# The entropy coder itself runs on the TPU (ops/rans.py): the decoder
# never downloads probabilities and never uploads decoded bits — the
# round-2 wire (19.5 MB/frame of f16 probabilities down + packed bit
# columns up, measured 2.45 s/frame through the dev tunnel) collapses to
# the actual bitstream, uploaded once per frame chunk.  Bit-exactness
# discipline is unchanged: ``_stage_step`` (the probability producer)
# stays the SAME executable on both sides; the rANS kernels are separate
# executables consuming the materialized f16 probabilities — a hard IEEE
# boundary, identical on both sides by value, not by fusion luck.

from ..ops.rans import (  # noqa: E402
    LANES,
    build_words_table,
    rans_compact_emissions,
    rans_decode_segment_tbl,
    rans_encode_segment,
    rans_initial_states,
    pack_rans_blob,
    pack_rans_blob_flat,
    unpack_rans_blob,
)


@jax.jit
def _pack_cols(col):
    """(F, Bv) {0,1} u8 -> (F, Bv/8) u8, numpy-packbits big order (the
    inverse of ops.superbricks.unpack_bits)."""
    f, bv = col.shape
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return (
        (col.reshape(f, bv // 8, 8).astype(jnp.int32) * w)
        .sum(-1)
        .astype(jnp.uint8)
    )


@partial(jax.jit, donate_argnums=(0, 1, 7))
def _rans_dec_stage(states, cursors, words, pr, vox_fr, vox_j, total,
                    bits_acc, stage, nf):
    """Decode one stage's bits on device and lay them out for the next
    stage: (F, Bv/8) packed column (the next ``_stage_step``'s ``prev``)
    plus an (outstage, tv) accumulation buffer downloaded once per level.
    ``words`` is the chunk-wide prebuilt stream table
    (ops.rans.build_words_table) — as an executable ARGUMENT it stays in
    HBM; in-executable construction re-staged it into VMEM per symbol
    step (cost ~ stream size; see ops/rans.py).
    """
    f, bv8 = nf.shape  # nf is a (F, Bv/8) shaped zero template
    tv = pr.shape[0]
    valid = jnp.arange(tv, dtype=jnp.int32) < total
    states, cursors, bits = rans_decode_segment_tbl(
        states, cursors, words, pr, valid
    )
    col = jnp.zeros((f, bv8 * 8), jnp.uint8).at[
        jnp.where(valid, vox_fr, f), jnp.where(valid, vox_j, 0)
    ].set(bits, mode="drop")
    bits_acc = jax.lax.dynamic_update_index_in_dim(bits_acc, bits, stage, 0)
    return states, cursors, _pack_cols(col), bits_acc


@partial(jax.jit, donate_argnums=(0, 1, 7, 8))
def _rans_dec_stage_scatter(states, cursors, words, pr, vox_fr, vox_j,
                            total, bits_acc, occ_buf, stage,
                            vox_brick, vox_slot):
    """Fused-probs-mode stage round tail: rANS-decode stage ``stage``'s
    bits AND scatter them straight into occupancy column ``stage`` of the
    brick buffer — the next `_fused_probs` call's context — in ONE
    dispatch (replaces `_rans_dec_stage` + the next round's
    `_scatter_col`).  The probability producer stays its own executable
    (the bit-exactness boundary); this only fuses the integer tail.

    The per-voxel occupancy is NOT updated here (round 5): only the
    level transition consumes it, so it is built ONCE per level from
    ``bits_acc`` (`_vox_occ_from_bits`) — one row scatter of tv 8-byte
    rows instead of outstage element scatters of f*bv bytes each.

    Returns (states, cursors, occ_buf, bits7_packed, bits_acc); the
    packed column is still emitted for the level transition's stage-7
    input."""
    f, bv = vox_brick.shape
    cap = occ_buf.shape[0] // f
    tv = pr.shape[0]
    valid = jnp.arange(tv, dtype=jnp.int32) < total
    states, cursors, bits = rans_decode_segment_tbl(
        states, cursors, words, pr, valid
    )
    col = jnp.zeros((f, bv), jnp.uint8).at[
        jnp.where(valid, vox_fr, f), jnp.where(valid, vox_j, 0)
    ].set(bits, mode="drop")
    bits_acc = jax.lax.dynamic_update_index_in_dim(bits_acc, bits, stage, 0)
    fr = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32)[:, None], (f, bv))
    flat_b = jnp.where(
        vox_brick >= 0, fr * cap + vox_brick, f * cap
    ).reshape(-1)
    occ_buf = occ_buf.at[
        flat_b, jnp.broadcast_to(stage, flat_b.shape), vox_slot.reshape(-1)
    ].set(col.reshape(-1), mode="drop")
    return states, cursors, occ_buf, _pack_cols(col), bits_acc


@partial(jax.jit, static_argnames=("f", "bv"))
def _vox_occ_from_bits(bits_acc, vox_fr, vox_j, total, f: int, bv: int):
    """(outstage, tv) decoded bits -> (F, Bv, 8) per-voxel occupancy in
    ONE row scatter (the level transition's input; round 5)."""
    tv = bits_acc.shape[1]
    valid = jnp.arange(tv, dtype=jnp.int32) < total
    rows = bits_acc.T  # (tv, 8)
    return (
        jnp.zeros((f, bv, 8), jnp.uint8)
        .at[jnp.where(valid, vox_fr, f), jnp.where(valid, vox_j, 0)]
        .set(rows, mode="drop")
    )


@partial(jax.jit, donate_argnums=(0,))
def _rans_enc_seg(states, pr, packed_col, vox_fr, vox_j, total):
    """Encode one (level, stage) segment on device from the SAME f16
    probabilities the decoder will consume and the ground-truth packed
    bit column already uploaded for ``_stage_step``."""
    tv = pr.shape[0]
    col = unpack_bits(packed_col)  # (F, Bv)
    bits = col[vox_fr, vox_j]
    valid = jnp.arange(tv, dtype=jnp.int32) < total
    bits = jnp.where(valid, bits, 0).astype(jnp.uint8)
    return rans_encode_segment(states, pr, bits, valid)


@jax.jit
def _lane_lens_stack(masks):
    """(K, LANES, 2) bool -> per-lane emitted byte counts (LANES,) i32."""
    return jnp.sum(
        masks.transpose(1, 0, 2).reshape(LANES, -1).astype(jnp.int32), axis=1
    )


@jax.jit
def _pack_tv(bits_acc):
    """(outstage, tv) {0,1} u8 -> (outstage, tv/8) packed download."""
    return _pack_cols(bits_acc)


def _rans_mode(cfg) -> bool:
    from .codec import _use_sb

    return _use_sb(cfg) and os.environ.get("LINR_CODEC_ENTROPY", "rans") != "ac"


def _pack_bits_frames(bit_arrays, bv: int) -> jnp.ndarray:
    """Per-frame bit vectors -> (F, Bv/8) packed upload."""
    f = len(bit_arrays)
    out = np.zeros((f, bv), np.uint8)
    for i, b in enumerate(bit_arrays):
        out[i, : len(b)] = b
    return jnp.asarray(np.packbits(out, axis=-1))


def _split_probs(pr_f16: np.ndarray, counts):
    out, pos = [], 0
    for n in counts:
        out.append(pr_f16[pos: pos + n].astype(np.float32))
        pos += n
    return out


class _LevelShapes:
    """Per-level static shapes shared by both codec sides.

    n_vox[s][i]: voxel count of frame i at level s.  Brick counts come
    from the octree identity bricks(s) = n_vox(s+2); the top two levels
    derive theirs from the (host-known) base coordinates.
    """

    def __init__(self, s_num: int, base_coords: list[np.ndarray]):
        self.s_num = s_num
        self.n_vox = [None] * s_num
        self.n_vox[s_num - 1] = [len(c) for c in base_coords]
        # host octree for the top two levels' brick counts (tiny arrays)
        from ..ops.octree import np_octree_down

        def nb(coords_list):
            return [
                len(np.unique((c.astype(np.int64)[:, 0] >> 2 << 42)
                              | (c.astype(np.int64)[:, 1] >> 2 << 21)
                              | (c.astype(np.int64)[:, 2] >> 2)))
                for c in coords_list
            ]

        self._top_bricks = {s_num - 1: nb(base_coords)}
        self._base_coords = base_coords

    def set_counts(self, s: int, counts: list[int]):
        self.n_vox[s] = counts

    def bricks(self, s: int) -> list[int]:
        if s + 2 < self.s_num:
            return self.n_vox[s + 2]
        if s in self._top_bricks:
            return self._top_bricks[s]
        # s == s_num - 2: need coords one level below the base — but the
        # caller records them via set_top_coords before reaching here
        raise KeyError(s)

    def set_top_coords(self, s: int, coords_list: list[np.ndarray]):
        """Record host coords for level s (only needed for s_num-2)."""
        def nb(c):
            key = (
                (c.astype(np.int64)[:, 0] >> 2 << 42)
                | (c.astype(np.int64)[:, 1] >> 2 << 21)
                | (c.astype(np.int64)[:, 2] >> 2)
            )
            return len(np.unique(key))

        self._top_bricks[s] = [nb(c) for c in coords_list]

    def buckets(self, s: int):
        bv = bucket_size(max(self.n_vox[s]))
        cap = _brick_bucket(max(self.bricks(s)))
        # tv is also the rANS segment length: round up to a LANES
        # multiple (pad symbols are real coded symbols at ~2e-5 bits)
        tv = -(-bucket_size(sum(self.n_vox[s])) // LANES) * LANES
        return bv, cap, tv


def _zero_buffers(f: int, cap: int, bv: int):
    occ_buf = jnp.zeros((f * cap, 8, B4_SLOTS), jnp.uint8)
    vox_occ = jnp.zeros((f, bv, 8), jnp.uint8)
    return occ_buf, vox_occ


def _resize_coords(coords, keys, bv: int):
    cur = coords.shape[1]
    if cur == bv:
        return coords, keys
    if cur > bv:
        return coords[:, :bv], keys[:, :bv]
    return (
        jnp.pad(coords, ((0, 0), (0, bv - cur), (0, 0))),
        jnp.pad(keys, ((0, 0), (0, bv - cur)), constant_values=KEY_PAD),
    )


# ---------------------------------------------------------------- encode --


def encode_chunk_probs_dev(params, cfg: ModelConfig, pyrs, keep_device=False,
                           probs_mode=None, fused_budget_gb=None,
                           fused_cs_cap=None):
    """Device-chain encode of one frame chunk: per level, the per-stage
    probability and ground-truth bit arrays (the decoder's exact
    executables; all 8 stage dispatches pipeline on device since the
    encoder knows every stage's bits up front).

    Returns [(s, probs[stage][frame], bits[stage][frame]), ...] in
    dispatch (coarse-to-fine) order.  With ``keep_device=True`` nothing
    is downloaded: returns [(s, probs_dev[stage] (tv,) f16, cols[stage]
    (F, Bv/8) u8 packed, geo, total, counts, tv), ...] for the device
    rANS sweep.

    HBM high-water accounting (round-3 advisor): keep_device retains the
    per-stage f16 probabilities and packed bit columns of EVERY level
    until the rANS sweep — outstage x 2 B/voxel x Sum_s tv_s ~ 16 B x
    1.3 x chunk voxels ~ 70 MB at the production chunk (4 x 800k pts),
    linear in CODEC_FRAME_CHUNK.  The big geometry arrays (code/nbr27)
    are NOT retained — only the slim per-voxel maps.  Releasing levels
    eagerly would require per-level rANS state chains (rANS is LIFO:
    coarse levels decode first so must be encoded LAST, but dispatch
    must run coarse-to-fine), costing LANES x 8 B of header per level
    (~9 KB/chunk, a few % of the wire) — rejected while the retained
    set stays two orders of magnitude under HBM; raise
    CODEC_FRAME_CHUNK past ~100 frames before revisiting.
    """
    f = len(pyrs)
    mode = probs_mode or _probs_mode()
    if fused_budget_gb is None:
        fused_budget_gb = _fused_budget_gb()
    if fused_cs_cap is None:
        fused_cs_cap = _fused_cs_cap()
    s_num = pyrs[0].scale_num
    shapes = _LevelShapes(
        s_num, [p.low_coords.astype(np.int32) for p in pyrs]
    )
    for s in range(s_num - 1, -1, -1):
        shapes.set_counts(s, [p.levels[s].n for p in pyrs])
    shapes.set_top_coords(
        s_num - 2,
        [p.levels[s_num - 2].coords[: p.levels[s_num - 2].n] for p in pyrs],
    )

    bv0 = bucket_size(max(shapes.n_vox[s_num - 1]))
    base = np.zeros((f, bv0, 3), np.int32)
    for i, p in enumerate(pyrs):
        base[i, : len(p.low_coords)] = p.low_coords
    coords, keys = _init_level(
        jnp.asarray(base),
        jnp.asarray(shapes.n_vox[s_num - 1], jnp.int32),
        bv0,
    )

    pending = []  # (s, prob handles, bits arrays, counts)
    t_dispatch = time.time()
    hist_keys, hist_parent, hist_geo = {}, {}, {}
    for s in range(s_num - 1, -1, -1):
        bv, cap, tv = shapes.buckets(s)
        coords, keys = _resize_coords(coords, keys, bv)
        counts = shapes.n_vox[s]
        hist_keys[s] = keys
        if s + 2 in hist_keys and s in hist_parent and s + 1 in hist_parent:
            # search-free brickify via the grandparent chain + grid
            geo = _brickify_level_gp2(
                coords, keys, jnp.asarray(counts, jnp.int32),
                jnp.int32(s), hist_parent[s], hist_parent[s + 1],
                hist_keys[s + 2], *hist_geo[s + 2], cap, tv,
            )
        else:
            geo = _brickify_level(
                coords, keys, jnp.asarray(counts, jnp.int32),
                jnp.int32(s), cap, tv,
            )
        hist_geo[s] = (
            geo["vox_brick"], geo["vox_slot"], geo["nbr27_pf"],
            geo["idx_grid"],
        )
        hist_keys.pop(s + 3, None)
        hist_parent.pop(s + 2, None)
        hist_geo.pop(s + 3, None)
        xg = _dev_ctx(params, cfg, geo["code"], geo["nbr27"], jnp.int32(s))
        occ_buf, vox_occ = _zero_buffers(f, cap, bv)
        stage_bits = [
            [
                np.ascontiguousarray(p.levels[s].occ[: p.levels[s].n, stage])
                for p in pyrs
            ]
            for stage in range(cfg.outstage)
        ]
        cols = [
            _pack_bits_frames(stage_bits[stage], bv)
            for stage in range(cfg.outstage)
        ]
        if mode == "fused":
            # outstage/cs stage-batched executables per level (round-3
            # verdict next #4): the encoder knows every stage's bits, so
            # the 8 serial _stage_step dispatches collapse to cs-wide
            # passes — cs x fewer gather-row-rate-bound halo exchanges,
            # with cs capped by the shared HBM model (_fused_cs)
            cs = _fused_cs(
                geo["code"].shape[0], cfg, fused_budget_gb, fused_cs_cap
            )
            occ_buf, vox_occ = _enc_occ_buffers(
                jnp.stack(cols[: cfg.outstage - 1]),
                geo["vox_brick"], geo["vox_slot"], occ_buf, vox_occ,
            )
            probs_dev = []
            with _prof_sync(f"enc_probs_s{s}") as ps:
                for b0 in range(0, cfg.outstage, cs):
                    prs = _fused_probs(
                        params, cfg, occ_buf, geo["code"], geo["nbr27"], xg,
                        geo["sel"], jnp.int32(b0), cs, b0 == 0,
                    )  # (cs, tv) f16, device
                    probs_dev.extend(prs[i] for i in range(cs))
                ps.arr = probs_dev[-1]
        else:
            probs_dev = []
            prev = jnp.zeros((f, bv // 8), jnp.uint8)
            for stage in range(cfg.outstage):
                occ_buf, vox_occ, pr = _stage_step(
                    params, cfg, occ_buf, vox_occ, geo["code"],
                    geo["nbr27"], xg, jnp.int32(stage), prev,
                    geo["vox_brick"], geo["vox_slot"], geo["sel"],
                )
                probs_dev.append(pr)
                # stage's own ground-truth column = the NEXT stage's
                # context
                prev = cols[stage]
        if s > 0:
            coords, keys, pidx = _transition(
                coords, keys, vox_occ, cols[cfg.outstage - 1],
                bucket_size(max(shapes.n_vox[s - 1])),
            )
            hist_parent[s - 1] = pidx
        if keep_device:
            # retain only the slim per-voxel maps for the rANS sweep —
            # NOT the whole geo dict (code/nbr27 are the big int32
            # arrays; dropping them lowers the encoder's HBM high-water
            # mark, round-3 advisor)
            pending.append(
                (s, probs_dev, cols, (geo["vox_fr"], geo["vox_j"]),
                 sum(counts), counts, tv)
            )
        else:
            pending.append((s, probs_dev, stage_bits, counts))
    PROF["enc_dispatch"] += time.time() - t_dispatch
    if keep_device:
        return pending

    # collect (device already fully dispatched; downloads overlap compute)
    out = []
    with _prof("enc_probs_down"):
        for s, probs_dev, stage_bits, counts in pending:
            probs = [
                _split_probs(np.asarray(probs_dev[stage]), counts)
                for stage in range(cfg.outstage)
            ]
            PROF["enc_bytes_down"] += sum(
                int(np.prod(p.shape)) * 2 for p in probs_dev  # f16 wire
            )
            out.append((s, probs, stage_bits))
    return out


def encode_gop_streams_rans(params, cfg: ModelConfig, pyramids):
    """Occupancy streams with the ON-DEVICE entropy coder: probabilities
    and ground-truth bits never leave the chip; per frame chunk the wire
    is ONE rans-v1 blob (ops/rans.py).

    rANS is LIFO, so segments are encoded in reverse decode order: levels
    fine-to-coarse (the decoder reads coarse-to-fine), stages 7..0 within
    a level; the per-level emissions are compacted on device into lane
    streams and stitched host-side in decode order."""
    f_total = len(pyramids)
    s_num = pyramids[0].scale_num
    chunk_blobs = []
    total_bits = 0
    for chunk in _frame_chunks(f_total):
        pyrs = [pyramids[i] for i in chunk]
        pending = encode_chunk_probs_dev(params, cfg, pyrs, keep_device=True)
        states = rans_initial_states()
        emis = {}
        t0 = time.time()
        for (s, probs_dev, cols, (vox_fr, vox_j), total, counts, tv) in (
            reversed(pending)
        ):
            seg_b, seg_m = [], []
            with _prof_sync(f"enc_rans_s{s}") as rs:
                for stage in reversed(range(cfg.outstage)):
                    states, byts, mask = _rans_enc_seg(
                        states, probs_dev[stage], cols[stage],
                        vox_fr, vox_j, jnp.int32(total),
                    )
                    seg_b.append(byts)
                    seg_m.append(mask)
                rs.arr = states
            # decode order within a level = stage ascending
            emis[s] = (
                jnp.concatenate(seg_b[::-1], axis=0),
                jnp.concatenate(seg_m[::-1], axis=0),
            )
        level_order = [p[0] for p in pending]  # decode (dispatch) order
        lens_dev = jnp.stack(
            [_lane_lens_stack(emis[s][1]) for s in level_order]
        )
        PROF["enc_rans_dispatch"] += time.time() - t0
        with _prof("enc_rans_sync"):
            lens_h = np.asarray(lens_dev)  # ONE host sync per chunk
        outs = []
        with _prof("enc_rans_compact"):
            for k, s in enumerate(level_order):
                # FINE bucket for the per-lane byte capacity: the
                # compact download is (LANES, ob), and at 4096 lanes the
                # voxel-grade bucket (min 1024) inflated it to 4 MB per
                # LEVEL (measured 8.4 MB/frame of tunnel download, r5);
                # lanes are round-robin balanced so max ~ mean and a
                # 32-granularity bucket keeps the download ~ wire-sized
                ob = _lane_bucket(int(lens_h[k].max()))
                _, out = rans_compact_emissions(
                    emis[s][0], emis[s][1], out_bucket=ob
                )
                outs.append(np.asarray(out))
                PROF["enc_bytes_down"] += out.size
            # lane-major ragged assembly, fully vectorized (the per-
            # (level, lane) .tobytes() join was 0.27 s/frame of host
            # time): payload position of level k, lane l, byte j is
            # lane_start[l] + sum(lens[:k, l]) + j
            lens_np = lens_h[: len(level_order)].astype(np.int64)
            lane_tot = lens_np.sum(axis=0)  # (LANES,)
            lane_start = np.concatenate([[0], np.cumsum(lane_tot)[:-1]])
            payload = np.empty(int(lane_tot.sum()), np.uint8)
            pos = lane_start.copy()
            for k, out in enumerate(outs):
                ln = lens_np[k]  # (LANES,)
                tot = int(ln.sum())
                if tot:
                    seg0 = np.repeat(pos, ln)
                    within = np.arange(tot, dtype=np.int64) - np.repeat(
                        np.cumsum(ln) - ln, ln
                    )
                    cols = np.arange(out.shape[1], dtype=np.int64)
                    payload[seg0 + within] = out[cols[None, :] < ln[:, None]]
                pos += ln
        blob = pack_rans_blob_flat(np.asarray(states), payload, lane_tot)
        chunk_blobs.append(blob)
        total_bits += len(blob) * 8
    return {"rans": chunk_blobs, "s_num": s_num}, total_bits


def encode_gop_streams_dev(params, cfg: ModelConfig, pyramids):
    """Occupancy streams for every (frame, scale): device-chain encode;
    the host AC runs after each chunk's dispatches are all in flight."""
    from ..coding import binary_encode_batch, pack_bitstream

    f_total = len(pyramids)
    s_num = pyramids[0].scale_num
    blobs = [[None] * s_num for _ in range(f_total)]
    total_bits = 0
    for chunk in _frame_chunks(f_total):
        pyrs = [pyramids[i] for i in chunk]
        f = len(pyrs)
        for s, probs, stage_bits in encode_chunk_probs_dev(params, cfg, pyrs):
            flat_probs, flat_bits = [], []
            for stage in range(cfg.outstage):
                for i in range(f):
                    flat_probs.append(probs[stage][i])
                    flat_bits.append(stage_bits[stage][i].astype(np.float32))
            with _prof("enc_ac"):
                streams = binary_encode_batch(flat_probs, flat_bits)
            for i in range(f):
                per_frame = [
                    streams[stage * f + i] for stage in range(cfg.outstage)
                ]
                blob = pack_bitstream(per_frame)
                blobs[chunk[i]][s] = blob
                total_bits += len(blob) * 8
    return blobs, total_bits


# ---------------------------------------------------------------- decode --


def decode_gop_streams_rans(params, cfg: ModelConfig, wire, lows,
                            probs_mode=None, fused_budget_gb=None,
                            fused_cs_cap=None):
    """Decode from per-chunk rans blobs: the entropy decode runs ON
    device, chained into the stage loop — per level the host does ONE
    download (the packed decoded bits, for shape derivation and the
    final rebuild); probabilities never cross the wire."""
    return decode_gop_streams_dev(
        params, cfg, None, lows, rans_chunks=wire["rans"],
        s_num=wire.get("s_num") or cfg.scale_num, probs_mode=probs_mode,
        fused_budget_gb=fused_budget_gb, fused_cs_cap=fused_cs_cap,
    )


def decode_gop_streams_dev(params, cfg: ModelConfig, frame_blobs, lows,
                           rans_chunks=None, s_num=None, probs_mode=None,
                           fused_budget_gb=None, fused_cs_cap=None):
    """Decode all frames coarse-to-fine with the device-resident chain.

    Per level: 8 serial {device stage-step -> host AC -> packed bits up}
    rounds (the structural minimum — stage i+1's context needs stage i's
    bits), then a device transition.  With ``rans_chunks`` the AC hop is
    replaced by the on-device rANS decode: no per-stage host round trip
    at all.  Final coordinates are rebuilt host-side from the decoded
    bits (no coordinate download).
    """
    from ..coding import binary_decode_batch, unpack_bitstream
    from ..ops.octree import np_octree_up

    f_total = len(lows)
    mode = probs_mode or _probs_mode()
    if fused_budget_gb is None:
        fused_budget_gb = _fused_budget_gb()
    if fused_cs_cap is None:
        fused_cs_cap = _fused_cs_cap()
    if s_num is None:
        s_num = len(frame_blobs[0])
    out_coords = [None] * f_total
    for ci, chunk in enumerate(_frame_chunks(f_total)):
        f = len(chunk)
        if rans_chunks is not None:
            with _prof("dec_stream_up"):
                r_states, r_flat, r_offs = unpack_rans_blob(rans_chunks[ci])
                r_st = jnp.asarray(r_states)
                r_cur = jnp.asarray(r_offs.astype(np.int32))
                # pad the flat stream to a BUCKETED length: the stream is
                # an argument of every per-level decode executable, so a
                # raw length would recompile the whole level chain for
                # each distinct chunk (every real GOP chunk has a unique
                # stream length; the zero tail is never consumed — lane
                # cursors stay within the recorded lane extents)
                sb = bucket_size(len(r_flat))
                r_stream = jnp.asarray(
                    np.concatenate(
                        [r_flat, np.zeros(sb - len(r_flat), np.uint8)]
                    )
                    if sb > len(r_flat)
                    else r_flat
                )
                # chunk-wide words table, built ONCE in its own
                # executable: as an ARGUMENT of the per-stage decodes it
                # stays in HBM (see ops/rans.py build_words_table)
                r_words = build_words_table(r_stream)
            PROF["dec_bytes_up"] += r_flat.nbytes
        base = [np.ascontiguousarray(lows[i], np.int32) for i in chunk]
        shapes = _LevelShapes(s_num, base)
        shapes.set_counts(s_num - 1, [len(c) for c in base])

        bv0 = bucket_size(max(len(c) for c in base))
        base_pad = np.zeros((f, bv0, 3), np.int32)
        for i, c in enumerate(base):
            base_pad[i, : len(c)] = c
        coords, keys = _init_level(
            jnp.asarray(base_pad),
            jnp.asarray([len(c) for c in base], jnp.int32),
            bv0,
        )

        all_bits = [[None] * s_num for _ in range(f)]  # [i][s] -> (n, 8)
        # incremental host rebuild state (rANS path): the octree_up chain
        # runs INSIDE the level loop, overlapped with the next level's
        # device compute — ``pending_up`` holds the last level's decoded
        # occupancies not yet applied to ``cur_coords``
        cur_coords = list(base)
        pending_up = None
        hist_keys, hist_parent, hist_geo = {}, {}, {}
        for s in range(s_num - 1, -1, -1):
            bv, cap, tv = shapes.buckets(s)
            coords, keys = _resize_coords(coords, keys, bv)
            counts = shapes.n_vox[s]
            hist_keys[s] = keys
            with _prof("dec_geom"):
                with _prof_sync(f"dec_brickify_s{s}") as bs:
                    if (
                        s + 2 in hist_keys
                        and s in hist_parent
                        and s + 1 in hist_parent
                    ):
                        geo = _brickify_level_gp2(
                            coords, keys, jnp.asarray(counts, jnp.int32),
                            jnp.int32(s), hist_parent[s],
                            hist_parent[s + 1], hist_keys[s + 2],
                            *hist_geo[s + 2], cap, tv,
                        )
                    else:
                        geo = _brickify_level(
                            coords, keys, jnp.asarray(counts, jnp.int32),
                            jnp.int32(s), cap, tv,
                        )
                    hist_geo[s] = (
                        geo["vox_brick"], geo["vox_slot"],
                        geo["nbr27_pf"], geo["idx_grid"],
                    )
                    bs.arr = geo["nbr27"]
                hist_keys.pop(s + 3, None)
                hist_parent.pop(s + 2, None)
                hist_geo.pop(s + 3, None)
                with _prof_sync(f"dec_xg_s{s}") as xs:
                    xg = _dev_ctx(
                        params, cfg, geo["code"], geo["nbr27"], jnp.int32(s)
                    )
                    xs.arr = xg
                occ_buf, vox_occ = _zero_buffers(f, cap, bv)
            prev = jnp.zeros((f, bv // 8), jnp.uint8)
            total = sum(counts)
            offs_f = np.concatenate([[0], np.cumsum(counts)])
            cs = _fused_cs(
                geo["code"].shape[0], cfg, fused_budget_gb, fused_cs_cap
            )
            if rans_chunks is not None:
                # device entropy decode: zero host round trips inside the
                # stage loop; ONE packed-bits download per level
                bits_acc = jnp.zeros((cfg.outstage, tv), jnp.uint8)
                for stage in range(cfg.outstage):
                    with _prof("dec_dispatch"):
                        if mode == "fused":
                            b0 = (stage // cs) * cs
                            with _prof_sync(f"dec_probs_s{s}") as ps:
                                pr = _fused_probs(
                                    params, cfg, occ_buf, geo["code"],
                                    geo["nbr27"], xg, geo["sel"],
                                    jnp.int32(b0), cs, b0 == 0,
                                )[stage - b0]
                                ps.arr = pr
                            with _prof_sync(f"dec_rans_s{s}") as rs:
                                (r_st, r_cur, occ_buf, prev,
                                 bits_acc) = _rans_dec_stage_scatter(
                                    r_st, r_cur, r_words, pr, geo["vox_fr"],
                                    geo["vox_j"], jnp.int32(total), bits_acc,
                                    occ_buf, jnp.int32(stage),
                                    geo["vox_brick"], geo["vox_slot"],
                                )
                                rs.arr = prev
                        else:
                            occ_buf, vox_occ, pr = _stage_step(
                                params, cfg, occ_buf, vox_occ, geo["code"],
                                geo["nbr27"], xg, jnp.int32(stage), prev,
                                geo["vox_brick"], geo["vox_slot"], geo["sel"],
                            )
                            r_st, r_cur, prev, bits_acc = _rans_dec_stage(
                                r_st, r_cur, r_words, pr, geo["vox_fr"],
                                geo["vox_j"], jnp.int32(total), bits_acc,
                                jnp.int32(stage),
                                jnp.zeros((f, bv // 8), jnp.uint8),
                            )
                bits_packed_dev = _pack_tv(bits_acc)  # dispatch, no sync
                if pending_up is not None:
                    # overlap: the device is busy with this level's stage
                    # chain; rebuild the PREVIOUS level's coordinates now
                    with _prof("dec_rebuild"):
                        cur_coords = [
                            np_octree_up(cur_coords[i], pending_up[i])
                            for i in range(f)
                        ]
                    pending_up = None
                with _prof("dec_bits_down"):
                    packed = np.asarray(bits_packed_dev)  # (8, tv/8)
                PROF["dec_bytes_down"] += packed.nbytes
                bits8 = np.unpackbits(packed, axis=-1)  # (8, tv)
                occ_host = [
                    np.ascontiguousarray(
                        bits8[:, offs_f[i]: offs_f[i + 1]].T
                    )
                    for i in range(f)
                ]
                pending_up = occ_host
            else:
                streams = [unpack_bitstream(frame_blobs[i][s]) for i in chunk]
                occ_host = [
                    np.zeros((counts[i], 8), np.uint8) for i in range(f)
                ]
                for stage in range(cfg.outstage):
                    with _prof("dec_dispatch"):
                        if mode == "fused":
                            occ_buf, vox_occ = _scatter_col(
                                occ_buf, vox_occ, prev,
                                jnp.int32(max(stage - 1, 0)),
                                geo["vox_brick"], geo["vox_slot"],
                            )
                            b0 = (stage // cs) * cs
                            pr = _fused_probs(
                                params, cfg, occ_buf, geo["code"],
                                geo["nbr27"], xg, geo["sel"],
                                jnp.int32(b0), cs, b0 == 0,
                            )[stage - b0]
                        else:
                            occ_buf, vox_occ, pr = _stage_step(
                                params, cfg, occ_buf, vox_occ, geo["code"],
                                geo["nbr27"], xg, jnp.int32(stage), prev,
                                geo["vox_brick"], geo["vox_slot"], geo["sel"],
                            )
                    with _prof("dec_probs_down"):
                        pr_h = np.asarray(pr)
                    PROF["dec_bytes_down"] += pr_h.nbytes
                    probs = _split_probs(pr_h, counts)
                    with _prof("dec_ac"):
                        decs = binary_decode_batch(
                            probs, [streams[i][stage] for i in range(f)]
                        )
                    for i in range(f):
                        occ_host[i][:, stage] = decs[i]
                    if stage < cfg.outstage - 1:
                        with _prof("dec_bits_up"):
                            prev = _pack_bits_frames(decs, bv)
                        PROF["dec_bytes_up"] += f * (bv // 8)
            for i in range(f):
                all_bits[i][s] = occ_host[i]
            if s > 0:
                with _prof("dec_transition"):
                    shapes.set_counts(
                        s - 1, [int(occ_host[i].sum()) for i in range(f)]
                    )
                    if s - 1 == s_num - 2:
                        # needs this level's bits applied NOW (shapes for
                        # the next level derive from its coordinates)
                        with _prof("dec_rebuild"):
                            cur_coords = [
                                np_octree_up(cur_coords[i], occ_host[i])
                                for i in range(f)
                            ]
                        pending_up = None
                        shapes.set_top_coords(s - 1, cur_coords)
                    if rans_chunks is not None:
                        last = prev  # stage-7 column, already on device
                        if mode == "fused":
                            # per-voxel occupancy built ONCE per level
                            # from the accumulated decoded bits (the
                            # per-stage scatters were dropped, round 5)
                            vox_occ = _vox_occ_from_bits(
                                bits_acc, geo["vox_fr"], geo["vox_j"],
                                jnp.int32(total), f, bv,
                            )
                    else:
                        last = _pack_bits_frames(
                            [occ_host[i][:, 7] for i in range(f)], bv
                        )
                    coords, keys, pidx = _transition(
                        coords, keys, vox_occ, last,
                        bucket_size(max(shapes.n_vox[s - 1])),
                    )
                    hist_parent[s - 1] = pidx

        # host reconstruction from decoded bits (no coordinate download)
        with _prof("dec_rebuild"):
            if rans_chunks is not None:
                if pending_up is not None:  # level 0's bits
                    cur_coords = [
                        np_octree_up(cur_coords[i], pending_up[i])
                        for i in range(f)
                    ]
                for i in range(f):
                    out_coords[chunk[i]] = cur_coords[i]
            else:
                for i in range(f):
                    cur = base[i]
                    for s in range(s_num - 1, -1, -1):
                        cur = np_octree_up(cur, all_bits[i][s])
                    out_coords[chunk[i]] = cur
    return out_coords
