"""Pallas (Mosaic) kernels for the slot-major 4^3 brick conv matmuls.

MEASURED NEGATIVE RESULT (round 4, docs/PROF_CONV_r04.json): at
production shapes these kernels LOSE 3.3x fwd / 5.6x vjp to the XLA
einsums — the plane windows slice VMEM at 288-lane (2.25x128) offsets
and every in-kernel window read pays a Mosaic lane-realignment relayout
that dwarfs the 4x structural-FLOP saving.  They stay env-gated
(LINR_CONV_KERNEL=pallas, default xla) as a reproducible measurement,
interpret-tested for exactness on CPU.

Original motivation (docs/DESIGN.md "Measured performance notes"): at production
channel widths (C = 8) the dense halo-as-operand conv matmul
(Bb, S, 216*C) @ (S, 216*C, 64*O) wastes 4x FLOPs on structural zeros —
every output slot reads only 27 of the 216 halo positions.  The
FLOP-exact blocking is by output x-plane: the 16 slots of output plane
p in {0..3} read exactly halo planes p, p+1, p+2, i.e. the CONTIGUOUS
window [p*36*C, (p+3)*36*C) of the flat halo (plane-major columns,
ops/superbricks.py layout) and produce the contiguous output window
[p*16*O, (p+1)*16*O) of the slot-major output (slots are x-major,
s = x*16 + y*4 + z).  Four matmuls of K = 108*C, N = 16*O cover all
1728 taps with 4x fewer FLOPs and (at O = 8) exactly 128 output lanes.

Doing this in XLA costs more than it saves: a minor-dim slice at a
non-128-aligned offset (36*C = 288 at C = 8) materializes a copy when it
feeds a dot, so the 4 window slices re-write ~2x the halo.  Inside a
Pallas kernel the windows are VMEM-local relayouts — the kernel reads
each halo block from HBM exactly once and runs the small dots from VMEM.

Mosaic layout law (learned the hard way — the first version of these
kernels put the stage axis in the block's second-to-last position with
block size 1, which the interpreter accepts but real Mosaic rejects):
the LAST TWO dims of every block must each be divisible by the dtype
tile (8/16, 128) or equal the whole array dim.  So every kernel here
uses a 1-D grid over row blocks, keeps the (S, K) trailing dims whole
(block = (TILE_B, S, K), both trailing dims == array dims), and loops
the small static stage count INSIDE the kernel.  The per-stage weight
tensor is VMEM-resident for the whole kernel (unblocked operand, single
buffer, fetched once); plane_matmul picks TILE_B to fit the ~16 MB VMEM
and falls back to the XLA einsum when the weights alone cannot fit.

The halo exchange itself STAYS in XLA: its 26 fragment gathers ride the
gather hardware at ~350 M rows/s (docs/DESIGN.md layout laws), which
Pallas cannot express better (per-row DMA is ~1 us/row — 1000x slower at
brick granularity).

Three kernels mirror the three big einsums of ops/superbricks.b4_convsm:

  plane_matmul(h, w2)   forward   y  = h @ w2        (and dx = g @ wt)
  plane_moment(x, g)    backward  m  = x^T g, accumulated VMEM-resident
                        in the COMPACT windowed layout
                        (S, 4, 16*C, 108*O) — plane p's slots against
                        plane p's halo window; off-window entries (which
                        the tap selection never reads) are not stored.

Selection between these kernels and the XLA einsums is the caller's
(ops/superbricks.py, env LINR_CONV_KERNEL).  Reference semantics being
reproduced: MinkowskiConvolution 3^3 (generative sparse conv), cf.
/root/reference/models/resnet.py:7-60 and upsample.py:143-181.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B4 = 4
B4_SLOTS = 64
B4_PLANE = 36
B4_HALO_VOL = 216

# VMEM working budget for picking TILE_B (physical ~16 MB; leave slack
# for Mosaic's own scratch and the semaphore/grid machinery).
VMEM_BUDGET = 12 * 2**20


def _interpret() -> bool:
    # Mosaic only exists on real TPU backends; CPU (tests, the virtual
    # 8-device mesh) runs the interpreter, which is semantically exact.
    return jax.default_backend() not in ("tpu", "axon")


def _pick_tile_b(bb: int, fixed_bytes: int, per_row_bytes: int) -> int:
    """Largest row-block (multiple of 128, max 512) whose double-buffered
    streams fit beside the resident operands; 0 if nothing fits.  Never
    larger than bb rounded up to 128 — an oversized block makes Mosaic
    stack-allocate the whole padded block and trips the scoped-vmem
    limit."""
    cap = max(128, -(-bb // 128) * 128)
    for tile in (512, 384, 256, 128):
        if tile > cap:
            continue
        if fixed_bytes + 2 * tile * per_row_bytes <= VMEM_BUDGET:
            return tile
    return 0


def _fwd_kernel(h_ref, w_ref, o_ref, *, kc: int, no: int, s: int):
    """One (TILE_B, S, 216*kc) block: 4 output-plane dots per stage from
    VMEM windows.  w_ref (S, 216*kc, 64*no) resident."""
    for si in range(s):
        for p in range(B4):
            hk = h_ref[:, si, p * B4_PLANE * kc: (p + 3) * B4_PLANE * kc]
            wk = w_ref[
                si,
                p * B4_PLANE * kc: (p + 3) * B4_PLANE * kc,
                p * 16 * no: (p + 1) * 16 * no,
            ]
            o_ref[:, si, p * 16 * no: (p + 1) * 16 * no] = jnp.dot(
                hk, wk, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _fwd_bm_kernel(
    h_ref, w_ref, b_ref, m_ref, e_ref, o_ref, *, kc: int, no: int, s: int
):
    """Forward with the conv epilogue fused: y = (h @ w2 + bias) * mask.

    A pallas_call is a fusion boundary — XLA cannot sink the bias/mask
    elementwise pass into the kernel the way it sinks it into a dot, so
    the kernel does it itself (saves one read+write of y per conv).
    b_ref (S, 64*no) resident; m_ref (T, 64) slot-mask block;
    e_ref (16, 16*no) the mask's slot->channel-minor expansion matrix
    (a tiny matmul — lane-splitting reshapes / jnp.repeat don't lower in
    Mosaic, and Pallas kernels cannot capture array constants).
    """
    for si in range(s):
        for p in range(B4):
            hk = h_ref[:, si, p * B4_PLANE * kc: (p + 3) * B4_PLANE * kc]
            wk = w_ref[
                si,
                p * B4_PLANE * kc: (p + 3) * B4_PLANE * kc,
                p * 16 * no: (p + 1) * 16 * no,
            ]
            acc = jnp.dot(hk, wk, preferred_element_type=jnp.float32)
            acc = acc + b_ref[si, p * 16 * no: (p + 1) * 16 * no][None, :]
            mrep = jnp.dot(
                m_ref[:, p * 16: (p + 1) * 16].astype(jnp.float32),
                e_ref[:],
                preferred_element_type=jnp.float32,
            )
            o_ref[:, si, p * 16 * no: (p + 1) * 16 * no] = (
                acc * mrep
            ).astype(o_ref.dtype)


def _xla_plane_matmul(h, w2, bias, mask):
    """Dense-einsum fallback (identical math incl. structural zeros)."""
    y = jnp.einsum(
        "bsk,skn->bsn", h, w2, preferred_element_type=jnp.float32
    )
    if bias is not None:
        o = w2.shape[-1] // B4_SLOTS
        y = (y + bias[None]) * jnp.repeat(mask, o, axis=-1)[:, None, :]
    return y.astype(h.dtype)


def plane_matmul(h, w2, kc: int, no: int, bias=None, mask=None):
    """y = h @ w2 through the 4 output-plane windows, with the conv
    epilogue optionally fused.

    h (Bb, S, 216*kc); w2 (S, 216*kc, 64*no) — the dense slot-major conv
    matrix (ops/superbricks.b4_conv_weight_matrix_sm); bias (S, 64*no)
    slot-tiled and mask (Bb, 64) must be passed together; returns
    (Bb, S, 64*no) in h.dtype.  Equals the dense einsum (+bias)*mask
    exactly up to f32-accumulation grouping (the skipped rows are
    structural zeros).
    """
    bb, s, hk = h.shape
    nn = B4_SLOTS * no
    assert hk == B4_HALO_VOL * kc and w2.shape == (s, hk, nn)
    assert (bias is None) == (mask is None)
    esz = h.dtype.itemsize
    fixed = s * hk * nn * w2.dtype.itemsize  # resident weights
    per_row = s * (hk + nn) * esz  # streamed in + out per row
    if bias is not None:
        fixed += s * nn * esz + 16 * 16 * no * 4
        per_row += B4_SLOTS * esz
    tile_b = _pick_tile_b(bb, fixed, per_row)
    if tile_b == 0:
        return _xla_plane_matmul(h, w2, bias, mask)
    nb = pl.cdiv(bb, tile_b)
    in_specs = [
        pl.BlockSpec(
            (tile_b, s, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 resident
    ]
    operands = [h, w2]
    if bias is None:
        kern = functools.partial(_fwd_kernel, kc=kc, no=no, s=s)
    else:
        kern = functools.partial(_fwd_bm_kernel, kc=kc, no=no, s=s)
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias resident
            pl.BlockSpec(
                (tile_b, B4_SLOTS), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # expansion resident
        ]
        e = np.zeros((16, 16 * no), np.float32)
        for i in range(16):
            e[i, i * no: (i + 1) * no] = 1.0
        operands += [bias, mask, jnp.asarray(e)]
    # x64 OFF while tracing the pallas_call: the package enables x64 for
    # 63-bit octree keys, which makes index-map constants i64, and the
    # Mosaic serde pass cannot legalize i64 index maps
    # ("failed to legalize operation 'func.return' (i32, i64, i64)").
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tile_b, s, nn), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((bb, s, nn), h.dtype),
            interpret=_interpret(),
        )(*operands)


def _moment_kernel(x_ref, g_ref, m_ref, *, kc: int, no: int, s: int, bb: int):
    """Accumulate one row block's plane moments into the VMEM-resident
    compact moment (S, 4, 16*kc, 108*no)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.zeros_like(m_ref)

    # rows beyond bb (ragged last block) must not pollute the moment;
    # where-mask BOTH operands — padding rows can be NaN, and 0*NaN=NaN
    rows = jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[0], 1), 0)
    valid = rows + i * x_ref.shape[0] < bb
    for si in range(s):
        for p in range(B4):
            xp = jnp.where(
                valid, x_ref[:, si, p * 16 * kc: (p + 1) * 16 * kc], 0
            )
            gp = jnp.where(
                valid,
                g_ref[:, si, p * B4_PLANE * no: (p + 3) * B4_PLANE * no],
                0,
            )
            m_ref[si, p] += jax.lax.dot_general(
                xp, gp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def plane_moment(x, g, kc: int, no: int):
    """m[s, p] = x[:, s, plane p]^T @ g[:, s, window p] — the COMPACT
    windowed brick moment.

    x (Bb, S, 64*kc) slot-major activations; g (Bb, S, 216*no) halo of
    the output cotangent; returns (S, 4, 16*kc, 108*no) f32.  Plane p of
    the dense "bsu,bsj->suj" moment restricted to its halo window
    [p*36*no, (p+3)*36*no) — exactly the entries the static tap
    selection reads (taps only live in-window); feed to
    superbricks.moment_taps for dw.
    """
    bb, s, uk = x.shape
    gk = B4_HALO_VOL * no
    assert uk == B4_SLOTS * kc and g.shape == (bb, s, gk)
    fixed = s * B4 * 16 * kc * 108 * no * 4  # resident f32 moment
    per_row = s * (uk + gk) * x.dtype.itemsize
    tile_b = _pick_tile_b(bb, fixed, per_row)
    if tile_b == 0:
        # XLA fallback: 4 per-plane windowed einsums
        return jnp.stack(
            [
                jnp.einsum(
                    "bsu,bsj->suj",
                    x[:, :, p * 16 * kc: (p + 1) * 16 * kc],
                    g[:, :, p * B4_PLANE * no: (p + 3) * B4_PLANE * no],
                    preferred_element_type=jnp.float32,
                )
                for p in range(B4)
            ],
            axis=1,
        ).astype(jnp.float32)
    nb = pl.cdiv(bb, tile_b)
    # x64 OFF at trace time: see plane_matmul (i64 index maps do not
    # legalize in the Mosaic serde pass).
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_moment_kernel, kc=kc, no=no, s=s, bb=bb),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (tile_b, s, uk), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_b, s, gk), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # resident
            out_shape=jax.ShapeDtypeStruct(
                (s, B4, 16 * kc, 108 * no), jnp.float32
            ),
            interpret=_interpret(),
        )(x, g)
