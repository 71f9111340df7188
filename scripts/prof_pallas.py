"""Pallas-on-axon feasibility probe + fused halo+matmul prototype timing.

Step 0 of the DESIGN.md roadmap item (3) "fused halo+matmul Pallas
kernel": before designing anything, establish (a) whether Mosaic kernels
compile/run at all through the axon remote-compile tunnel, and (b) what
a VMEM-resident assemble+matmul actually costs vs the XLA slot-major
path (ops/superbricks.b4_convsm).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_pallas.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# CPU validation: PALLAS_INTERPRET=1 runs every kernel in the interpreter
if os.environ.get("PALLAS_INTERPRET"):
    import functools

    pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def probe_basic():
    """Minimal kernel: does pallas_call lower + run on the axon backend?"""

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + 1.0

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    y = f(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2 + 1)
    print("PALLAS BASIC: OK")


def probe_matmul_grid():
    """Tiled matmul with a grid — exercises BlockSpec index maps + MXU."""
    M, K, N = 512, 512, 512
    TM, TN = 128, 128

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(
            a_ref[:], b_ref[:], preferred_element_type=jnp.float32
        )

    @jax.jit
    def mm(a, b):
        return pl.pallas_call(
            kernel,
            grid=(M // TM, N // TN),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )(a, b)

    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k0, (M, K), jnp.float32)
    b = jax.random.normal(k1, (K, N), jnp.float32)
    y = mm(a, b)
    ref = a @ b
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-4)
    print("PALLAS GRID MATMUL: OK")


def probe_scalar_prefetch_gather():
    """Row gather via scalar-prefetched indices + per-row DMA — the shape
    of a fused halo kernel's neighbor fetch."""
    NB, D = 512, 256

    def kernel(idx_ref, x_hbm, o_ref, scratch, sem):
        i = pl.program_id(0)
        src = idx_ref[i]
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, 1), :], scratch, sem
        )
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:] * 1.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, D), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    @jax.jit
    def g(idx, x):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NB, D), jnp.float32),
        )(idx, x)

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, NB, NB, dtype=np.int32))
    x = jax.random.normal(jax.random.PRNGKey(1), (NB, D), jnp.float32)
    y = g(idx, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x)[np.asarray(idx)])
    print("PALLAS SCALAR-PREFETCH GATHER: OK")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for name, fn in [
        ("basic", probe_basic),
        ("grid_matmul", probe_matmul_grid),
        ("gather", probe_scalar_prefetch_gather),
    ]:
        t0 = time.time()
        try:
            fn()
        except Exception as e:
            print(f"PALLAS {name} FAILED: {e!r}")
        print(f"  [{name}: {time.time()-t0:.1f}s]")
