"""Pallas (Mosaic) kernels for the slot-major 4^3 brick conv matmuls.

Motivation (docs/DESIGN.md "Measured performance notes"): at production
channel widths (C = 8) the dense halo-as-operand conv matmul
(Bb, S, 216*C) @ (S, 216*C, 64*O) wastes 8x FLOPs on structural zeros —
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
Pallas kernel the windows are free VMEM views — the kernel reads each
halo block from HBM once and runs the 4 small dots from VMEM.

The halo exchange itself STAYS in XLA: its 26 fragment gathers ride the
gather hardware at ~350 M rows/s (docs/DESIGN.md layout laws), which
Pallas cannot express better (per-row DMA is ~1 us/row — 1000x slower at
brick granularity).

Three kernels mirror the three big einsums of ops/superbricks.b4_convsm:

  plane_matmul(h, w2)   forward   y  = h @ w2        (and dx = g @ wt)
  plane_moment(x, g)    backward  m  = x^T g, written into the full
                        (S, 64*C, 216*O) moment layout with exact zeros
                        outside the plane windows, so the caller's
                        static tap-selection einsum applies unchanged.

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

# Rows per grid block.  VMEM at the widest production conv (C = 12,
# bf16): halo block 512*2592*2 = 2.6 MB (x2 pipeline buffers), weight
# block 2592*512*2 = 2.6 MB, output 0.5 MB — comfortably inside 16 MB.
TILE_B = 512


def _interpret() -> bool:
    # Mosaic only exists on real TPU backends; CPU (tests, the virtual
    # 8-device mesh) runs the interpreter, which is semantically exact.
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_kernel(h_ref, w_ref, o_ref, *, kc: int, no: int):
    """One (TILE_B, s) block: 4 output-plane dots from VMEM windows.

    h_ref (T, 1, 216*kc), w_ref (1, 216*kc, 64*no), o_ref (T, 1, 64*no).
    """
    for p in range(B4):
        hk = h_ref[:, 0, p * B4_PLANE * kc: (p + 3) * B4_PLANE * kc]
        wk = w_ref[
            0,
            p * B4_PLANE * kc: (p + 3) * B4_PLANE * kc,
            p * 16 * no: (p + 1) * 16 * no,
        ]
        o_ref[:, 0, p * 16 * no: (p + 1) * 16 * no] = jnp.dot(
            hk, wk, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _fwd_bm_kernel(
    h_ref, w_ref, b_ref, m_ref, e_ref, o_ref, *, kc: int, no: int
):
    """Forward with the conv epilogue fused: y = (h @ w2 + bias) * mask.

    A pallas_call is a fusion boundary — XLA cannot sink the bias/mask
    elementwise pass into the kernel the way it sinks it into a dot, so
    the kernel does it itself (saves one read+write of y per conv).
    b_ref (1, 1, 64*no) pre-tiled over slots; m_ref (T, 1, 64) slot mask;
    e_ref (1, 16, 16*no) the mask's slot->channel-minor expansion matrix
    (a tiny matmul — lane-splitting reshapes / jnp.repeat don't lower in
    Mosaic, and Pallas kernels cannot capture array constants).
    """
    for p in range(B4):
        hk = h_ref[:, 0, p * B4_PLANE * kc: (p + 3) * B4_PLANE * kc]
        wk = w_ref[
            0,
            p * B4_PLANE * kc: (p + 3) * B4_PLANE * kc,
            p * 16 * no: (p + 1) * 16 * no,
        ]
        acc = jnp.dot(hk, wk, preferred_element_type=jnp.float32)
        acc = acc + b_ref[0, 0, p * 16 * no: (p + 1) * 16 * no][None, :]
        mrep = jnp.dot(
            m_ref[:, 0, p * 16: (p + 1) * 16].astype(jnp.float32),
            e_ref[0],
            preferred_element_type=jnp.float32,
        )
        o_ref[:, 0, p * 16 * no: (p + 1) * 16 * no] = (
            acc * mrep
        ).astype(o_ref.dtype)


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
    assert hk == B4_HALO_VOL * kc and w2.shape == (s, hk, B4_SLOTS * no)
    assert (bias is None) == (mask is None)
    nb = pl.cdiv(bb, TILE_B)
    in_specs = [
        pl.BlockSpec(
            (TILE_B, 1, hk), lambda si, i: (i, si, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, hk, B4_SLOTS * no), lambda si, i: (si, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [h, w2]
    if bias is None:
        kern = functools.partial(_fwd_kernel, kc=kc, no=no)
    else:
        kern = functools.partial(_fwd_bm_kernel, kc=kc, no=no)
        in_specs += [
            pl.BlockSpec(
                (1, 1, B4_SLOTS * no), lambda si, i: (si, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_B, 1, B4_SLOTS), lambda si, i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 16, 16 * no), lambda si, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        e = np.zeros((16, 16 * no), np.float32)
        for i in range(16):
            e[i, i * no: (i + 1) * no] = 1.0
        operands += [
            bias[:, None, :],
            mask[:, None, :],
            jnp.asarray(e)[None],
        ]
    return pl.pallas_call(
        kern,
        grid=(s, nb),  # s outer: the stage's weight block stays resident
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TILE_B, 1, B4_SLOTS * no), lambda si, i: (i, si, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bb, s, B4_SLOTS * no), h.dtype),
        interpret=_interpret(),
    )(*operands)


def _moment_kernel(x_ref, g_ref, m_ref, *, kc: int, no: int, bb: int):
    """Accumulate one block's plane moments into the (64*kc, 216*no)
    moment of stage s.  Off-window entries stay exactly zero (the
    caller's tap selection reads only the windows, but zeros keep the
    layout identical to the dense einsum's).
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.zeros_like(m_ref)

    # rows beyond bb (ragged last block) must not pollute the moment;
    # where-mask BOTH operands — padding rows can be NaN, and 0*NaN=NaN
    rows = jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[0], 1), 0)
    valid = rows + i * x_ref.shape[0] < bb
    for p in range(B4):
        xp = jnp.where(valid, x_ref[:, 0, p * 16 * kc: (p + 1) * 16 * kc], 0)
        gp = jnp.where(
            valid,
            g_ref[:, 0, p * B4_PLANE * no: (p + 3) * B4_PLANE * no],
            0,
        )
        m_ref[
            0,
            p * 16 * kc: (p + 1) * 16 * kc,
            p * B4_PLANE * no: (p + 3) * B4_PLANE * no,
        ] += jax.lax.dot_general(
            xp, gp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def plane_moment(x, g, kc: int, no: int):
    """m[s] = x[:, s]^T @ g[:, s] restricted to the plane windows.

    x (Bb, S, 64*kc) slot-major activations; g (Bb, S, 216*no) halo of
    the output cotangent; returns (S, 64*kc, 216*no) f32 with exact
    zeros outside the windows — drop-in for the dense "bsu,bsj->suj"
    einsum feeding the static tap selection (taps only live in-window).
    """
    bb, s, uk = x.shape
    assert uk == B4_SLOTS * kc and g.shape == (bb, s, B4_HALO_VOL * no)
    nb = pl.cdiv(bb, TILE_B)
    return pl.pallas_call(
        functools.partial(_moment_kernel, kc=kc, no=no, bb=bb),
        grid=(s, nb),  # i inner: each stage's moment accumulates in VMEM
        in_specs=[
            pl.BlockSpec(
                (TILE_B, 1, uk), lambda si, i: (i, si, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_B, 1, B4_HALO_VOL * no), lambda si, i: (i, si, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, uk, B4_HALO_VOL * no), lambda si, i: (si, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (s, uk, B4_HALO_VOL * no), jnp.float32
        ),
        interpret=_interpret(),
    )(x, g)
