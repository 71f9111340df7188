"""GOP assembly and training on the superbrick layout (the TPU fast path,
v2 — see models/sb_network.py for the design).

Mirrors runtime/brick_overfit.py's assemble/epoch contract.  Identical
optimization semantics: the loss over occupied slots equals the flat
voxel loss, so Adam/StepLR trajectories match the parity trainer
(/root/reference/main.py:231-321 semantics, verified in tests).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..data.dataset import FramePyramid
from ..models import ModelConfig
from ..models.sb_network import sb_training_bits, ACT
from ..ops.superbricks import build_superbrick_level, unpack_bits, SB_SLOTS
from .overfit import TrainConfig, adam_frame_update

F32 = jnp.float32


def _sb_bucket(n: int) -> int:
    # superbrick counts are ~100x smaller than voxel counts; fine buckets
    if n <= 64:
        return 64
    p = 1 << (int(n - 1).bit_length() - 1)
    step = max(64, p // 4)
    return ((n + step - 1) // step) * step


@dataclasses.dataclass
class SbGopBatch:
    """Wire/HBM discipline: ``code`` is int16 (values <= scale*128+127,
    sentinel -1) and ``occ`` is BIT-PACKED along the slot axis — together
    ~3x fewer bytes across host->device and resident in HBM (1.0 GB vs
    3.0 GB for a 32-frame 800k-pt GOP).  Consumers unpack occupancy
    in-jit (ops/superbricks.unpack_bits, pure VPU)."""

    nbr27: jax.Array     # (F, Bb, 27) int32 flat-global brick map, -1 absent
    code: jax.Array      # (F, Bb, slots) int16 scale*128+feat, -1 empty
    occ: jax.Array       # (F, Bb, 8, slots/8) uint8 bit-packed occupancy
    point_num: jax.Array  # (F,) float32
    level_slices: tuple  # static ((start, end, scale_idx), ...) per scale

    @property
    def n_frames(self):
        return self.nbr27.shape[0]

    def occ_dense(self, f: int):
        """Unpacked (Bb, 8, slots) uint8 view of frame ``f`` (tests)."""
        from ..ops.superbricks import unpack_bits

        return unpack_bits(self.occ[f])


def assemble_gop_superbricks(
    pyramids: list[FramePyramid], side: int = 4, as_numpy: bool = False
) -> SbGopBatch:
    """``side`` = 4 (default, the fast path: the halo IS the conv operand)
    or 8 (coarser gather granularity; kept for comparison/testing)."""
    return assemble_gops_superbricks([pyramids], side=side, as_numpy=as_numpy)[0]


def assemble_gops_superbricks(
    pyr_groups: list[list[FramePyramid]], side: int = 4,
    as_numpy: bool = False,
) -> list[SbGopBatch]:
    """Assemble several GOPs with COMMON per-level buckets (one
    ``level_slices`` across all returned batches) so they can be stacked
    on a leading GOP axis and trained by ONE compiled program — the
    GOP-parallel trainer (parallel/gop_parallel.py).  Buckets are the max
    over every frame of every GOP, quantized by ``_sb_bucket`` exactly as
    the single-GOP path.

    ``as_numpy`` keeps the batch arrays host-side (no device upload) so
    callers can time/overlap the transfer themselves (bench.py splits
    host build vs upload per the round-4 verdict)."""
    s_num = pyr_groups[0][0].scale_num
    assert all(
        p.scale_num == s_num for grp in pyr_groups for p in grp
    )
    slots = side**3

    bl_groups = [
        [
            [
                build_superbrick_level(
                    p.levels[s].coords[: p.levels[s].n],
                    p.levels[s].occ[: p.levels[s].n],
                    p.levels[s].feat_code[: p.levels[s].n],
                    s,
                    side=side,
                )
                for s in range(s_num)
            ]
            for p in grp
        ]
        for grp in pyr_groups
    ]
    buckets = [
        _sb_bucket(
            max(fl[s].n_bricks for bl in bl_groups for fl in bl)
        )
        for s in range(s_num)
    ]
    offsets = np.cumsum([0] + buckets[:-1]).astype(np.int64)
    total = int(sum(buckets))
    level_slices = tuple(
        (int(offsets[s]), int(offsets[s] + buckets[s]), s) for s in range(s_num)
    )

    out = []
    for bl, grp in zip(bl_groups, pyr_groups):
        f_nbr, f_code, f_occ = [], [], []
        for fl in bl:
            nbr = np.full((total, 27), -1, np.int32)
            code = np.full((total, slots), -1, np.int16)
            occ = np.zeros((total, 8, slots), np.uint8)
            for s in range(s_num):
                lev = fl[s]
                a = int(offsets[s])
                nb = lev.n_bricks
                nbr[a: a + nb] = np.where(
                    lev.nbr27 >= 0, lev.nbr27 + np.int32(a), -1
                )
                code[a: a + nb] = lev.scale_code.astype(np.int16)
                occ[a: a + nb] = lev.occ
            f_nbr.append(nbr)
            f_code.append(code)
            f_occ.append(np.packbits(occ, axis=-1))
        conv = (lambda a: a) if as_numpy else jnp.asarray
        out.append(
            SbGopBatch(
                nbr27=conv(np.stack(f_nbr)),
                code=conv(np.stack(f_code)),
                occ=conv(np.stack(f_occ)),
                point_num=conv(
                    np.array([p.point_num for p in grp], np.float32)
                ),
                level_slices=level_slices,
            )
        )
    return out


def sb_frame_loss(params, cfg: ModelConfig, fd: dict, level_slices,
                  compute_dtype=jnp.float32):
    """Per-frame bits/point.  The slot mask is derived from the code
    sentinel (-1 = empty slot) — no separate mask array in HBM."""
    mask = (fd["code"] >= 0).astype(compute_dtype)[:, None, None, :]
    geom = dict(
        nbr27=fd["nbr27"], mask=mask, code=fd["code"], dtype=compute_dtype
    )
    occ = unpack_bits(fd["occ"])
    bits = sb_training_bits(params, cfg, geom, occ, level_slices)
    return bits / fd["point_num"]


def level_groups(level_slices, max_group_bricks: int | None = None):
    """Partition the (contiguous, ordered) level slices into groups for
    sequential gradient accumulation.

    Octree levels are independent given the parameters (the loss is a sum
    over levels; no activation crosses a level boundary), so the frame
    gradient can be accumulated group-by-group — peak HBM becomes the
    largest group's working set instead of the whole frame's.  The finest
    level is ~half of all bricks and is indivisible (halo exchanges cross
    brick boundaries within a level), so it bounds the peak at ~50%.

    Returns [(start, end, rebased_slices), ...] where rebased_slices are
    (a - start, b - start, scale_idx) tuples.
    """
    total = level_slices[-1][1]
    if max_group_bricks is None:
        # group only at production scale; small (test) batches in one piece
        max_group_bricks = total if total <= 4096 else max(total // 3, 1)
    groups, cur = [], []
    for sl in level_slices:
        if cur and (sl[1] - cur[0][0]) > max_group_bricks:
            groups.append(cur)
            cur = []
        cur.append(sl)
    if cur:
        groups.append(cur)
    return [
        (
            g[0][0],
            g[-1][1],
            tuple((a - g[0][0], b - g[0][0], s) for (a, b, s) in g),
        )
        for g in groups
    ]


def make_frame_grads_sb(cfg: ModelConfig, level_slices,
                        compute_dtype=jnp.bfloat16,
                        max_group_bricks: int | None = None,
                        stage_chunk: int | None = None,
                        slots: int = 64):
    """(params, fd) -> (loss, grads) for ONE frame on the superbrick
    layout — the shared gradient core of the sequential trainer
    (make_epoch_fn_sb) and the frame-data-parallel trainer
    (parallel/train.make_epoch_fn_sb_dp, which vmaps it over a sharded
    frame axis).

    Memory discipline, two layers:

      * the loss is wrapped in jax.checkpoint(policy=save_only_these_names
        ('act')): conv outputs are saved for the backward pass, the
        multi-GB halo/extraction temporaries are recomputed per conv
        (scatter-free fold, ops/superbricks.sb_halo VJP);

      * at production scale the frame gradient is accumulated over
        (LEVEL-GROUP x STAGE-CHUNK) units: the loss is a sum over both
        axes (levels are disjoint node sets; stages are data-independent
        given the inputs), so unit gradients sum to the exact full-frame
        gradient.  value_and_grad runs per unit and
        ``jax.lax.optimization_barrier`` chains each unit's forward on
        the previous unit's gradients, forcing XLA to schedule them
        sequentially — peak HBM is one unit's working set (the finest
        level is indivisible along the brick axis since halo exchanges
        cross brick boundaries, but its 8 stages chunk freely).
    """
    policy = jax.checkpoint_policies.save_only_these_names(ACT)
    total = level_slices[-1][1]
    small = total * slots <= 4096 * 512  # tiny (test) batches: one unit
    if max_group_bricks is None and small:
        max_group_bricks = total
    groups = level_groups(level_slices, max_group_bricks)
    # The fused pass rides block_in on the context chunk's halo exchanges
    # (the halo is gather row-rate bound, so the S=1 x_glob pass costs
    # ~80% of a whole chunk; see models/sb_network.sb_fused_chunk_logits).
    # It requires the default 1-layer inception block_in — init_params
    # gives block variants to block_in only.
    fused = (
        slots == 64
        and cfg.block_layers == 1
        and cfg.block_type == "inception"
    )
    bf16 = compute_dtype == jnp.bfloat16
    if stage_chunk is None:
        # Auto per GROUP (finest-level groups are the HBM peak).  Base
        # width from the backend, then capped so the chunk's working set
        # fits HBM: the measured bf16 fused demand at production config
        # (hidden_channel_conv=8) is ~26 KB per brick-row incl. XLA
        # fragmentation — 81920 bricks x (8+1) rows compiled to 18.87 GB
        # and OOMed a 15.75 GB v5e (round 4 bench).  cs=4 twice costs the
        # same wall time as cs=8 once at that size (docs/SP_MODEL_r04.json:
        # 2 x 408.5 ms vs 812.4 ms) — the halo overhead amortizes by cs=4.
        if small:
            base_cs = cfg.outstage
        elif fused:
            base_cs = 8 if bf16 else 4
        elif slots == 64:
            base_cs = 4 if bf16 else 2
        else:
            base_cs = 2
        bpr = (26 if bf16 else 52) * 1024  # bytes per brick-row, measured
        hbm_budget = float(
            os.environ.get("LINR_SB_HBM_GB", "14")
        ) * 2**30
        divisors = [
            d for d in range(cfg.outstage, 0, -1) if cfg.outstage % d == 0
        ]

        def pick_cs(group_bricks: int) -> int:
            for d in divisors:
                if d > base_cs:
                    continue
                if small or (d + 1) * group_bricks * bpr <= hbm_budget:
                    return d
            return 1

    else:
        assert cfg.outstage % stage_chunk == 0, (cfg.outstage, stage_chunk)

        def pick_cs(group_bricks: int) -> int:
            return stage_chunk

    from ..models.sb_network import (
        sb_chunk_bits,
        sb_fused_chunk_bits,
        sb_x_glob,
    )

    def make_group_fn(sub_slices, cs):
        """(params, sub) -> (bits, grads) for one level group.

        Structure: x_glob (input embedding + block_in) is computed ONCE
        via jax.vjp; the stage chunks run as a lax.scan over a TRACED
        chunk base — one compiled chunk graph serves every position, the
        scan serializes them (peak HBM = one chunk), and value_and_grad
        inside the body makes the scan forward-only (no stacked
        residuals).  The accumulated d(x_glob) is folded back through the
        block_in VJP at the end.  Exact: the loss is a sum over stages.
        """
        n_chunks = cfg.outstage // cs

        def geom_of(sub):
            mask = (sub["code"] >= 0).astype(compute_dtype)[:, None, None, :]
            return dict(
                nbr27=sub["nbr27"], mask=mask, code=sub["code"],
                dtype=compute_dtype,
            )

        if fused:
            def fchunk_fn(p, sub, base, _first=False):
                return sb_fused_chunk_bits(
                    p, cfg, geom_of(sub), unpack_bits(sub["occ"]), base,
                    cs, sub_slices, _first,
                )

            fchunk_vg = jax.value_and_grad(
                jax.checkpoint(fchunk_fn, policy=policy)
            )
            fchunk_vg_first = jax.value_and_grad(
                jax.checkpoint(
                    lambda p, sub, base: fchunk_fn(p, sub, base, True),
                    policy=policy,
                )
            )

            def fused_fn(params, sub):
                # chunk 0 runs a SPECIALIZED graph (first=True: stage 0's
                # gated-to-zero context row is not computed); remaining
                # chunk positions share one compiled graph via the scan.
                # The barrier serializes chunk 0 before the scan (peak
                # HBM stays one chunk's working set).
                bits0, gp0 = fchunk_vg_first(params, sub, jnp.int32(0))
                if n_chunks == 1:
                    return bits0, gp0

                def body(carry, base):
                    bits_a, gp_a = carry
                    bits, gp = fchunk_vg(params, sub, base)
                    return (
                        bits_a + bits,
                        jax.tree_util.tree_map(jnp.add, gp_a, gp),
                    ), None

                init = jax.lax.optimization_barrier((bits0, gp0))
                (bits, gp), _ = jax.lax.scan(
                    body, init,
                    jnp.arange(1, n_chunks, dtype=jnp.int32) * cs,
                )
                return bits, gp

            return fused_fn

        xg_fwd = jax.checkpoint(
            lambda p, sub: sb_x_glob(p, cfg, geom_of(sub), sub_slices),
            policy=policy,
        )

        def chunk_fn(p, xg, sub, base):
            return sb_chunk_bits(
                p, cfg, geom_of(sub), unpack_bits(sub["occ"]), base,
                cs, xg,
            )

        chunk_vg = jax.value_and_grad(
            jax.checkpoint(chunk_fn, policy=policy), argnums=(0, 1)
        )

        def fn(params, sub):
            x_glob, bi_vjp = jax.vjp(lambda p: xg_fwd(p, sub), params)

            def body(carry, base):
                bits_a, gp_a, gx_a = carry
                bits, (gp, gx) = chunk_vg(params, x_glob, sub, base)
                return (
                    bits_a + bits,
                    jax.tree_util.tree_map(jnp.add, gp_a, gp),
                    gx_a + gx,
                ), None

            init = (
                jnp.zeros((), F32),
                jax.tree_util.tree_map(jnp.zeros_like, params),
                jnp.zeros_like(x_glob),
            )
            (bits, gp, gx), _ = jax.lax.scan(
                body, init,
                jnp.arange(n_chunks, dtype=jnp.int32) * cs,
            )
            grads = jax.tree_util.tree_map(jnp.add, gp, bi_vjp(gx)[0])
            return bits, grads

        return fn

    group_fns = [
        (ga, gb, make_group_fn(sub_slices, pick_cs(gb - ga)))
        for (ga, gb, sub_slices) in groups
    ]

    def frame_grads(params, fd):
        bits_total = jnp.zeros((), F32)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        p_in = params
        for (ga, gb, fn) in group_fns:
            nbr = fd["nbr27"][ga:gb]
            sub = dict(
                # neighbor indices are flat-global but stay within the
                # level (levels are separate coordinate systems) — rebase
                nbr27=jnp.where(nbr >= 0, nbr - jnp.int32(ga), -1),
                code=fd["code"][ga:gb],
                occ=fd["occ"][ga:gb],
            )
            bits, g = fn(p_in, sub)
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
            bits_total = bits_total + bits
            # serialize: the next group's forward reads p_in, which now
            # depends on this group's gradients
            p_in, grads, bits_total = jax.lax.optimization_barrier(
                (p_in, grads, bits_total)
            )
        loss = bits_total / fd["point_num"]
        grads = jax.tree_util.tree_map(
            lambda gi: gi / fd["point_num"], grads
        )
        return loss, grads

    return frame_grads


def make_epoch_fn_sb(cfg: ModelConfig, tc: TrainConfig, level_slices,
                     compute_dtype=jnp.bfloat16,
                     max_group_bricks: int | None = None,
                     stage_chunk: int | None = None,
                     slots: int = 64):
    """Sequential superbrick epoch trainer: one jitted per-frame step
    (gradient + Adam + LR-schedule step), host loop over frames — the
    contract of brick_overfit.make_epoch_fn_bricks with the gradient core
    of ``make_frame_grads_sb`` (see there for the memory discipline).
    Adam/StepLR semantics are the parity trainer's, unchanged."""
    frame_grads = make_frame_grads_sb(
        cfg, level_slices, compute_dtype, max_group_bricks, stage_chunk,
        slots,
    )

    @jax.jit
    def frame_step(params, opt, lr, k, fd):
        loss, grads = frame_grads(params, fd)
        params, opt = adam_frame_update(params, opt, lr, grads, tc)
        k = k + 1
        lr = jnp.where(k % tc.step_size == 0, lr * tc.gamma, lr)
        return params, opt, lr, k, loss

    @jax.jit
    def slice_frame(arrays, i):
        return jax.tree_util.tree_map(lambda a: a[i], arrays)

    def epoch_fn(params, opt, lr, sched_count, batch: SbGopBatch):
        arrays = dict(
            nbr27=batch.nbr27,
            code=batch.code,
            occ=batch.occ,
            point_num=batch.point_num,
        )
        losses = []
        k = sched_count
        for i in range(batch.n_frames):
            fd = slice_frame(arrays, i)
            params, opt, lr, k, loss = frame_step(params, opt, lr, k, fd)
            losses.append(loss)
        lr = jnp.maximum(lr, tc.min_lr)
        return params, opt, lr, k, jnp.stack(losses)

    return epoch_fn
