"""linr_pcgc_tpu — a TPU-native lossless point-cloud geometry codec framework.

A ground-up JAX/XLA rebuild of the capabilities of LINR-PCGC (ICCV 2025,
reference implementation studied at /root/reference): an INR/overfitting codec
where a tiny multiscale sparse network is overfit per group-of-frames (GOP),
its quantized weights are entropy-coded, and per-frame octree occupancy bits
are arithmetic-coded under the network's predicted probabilities.

Architecture (TPU-first, not a port):
  * ``ops``      — vectorized voxel geometry: lexicographic ravel keys, octree
                   down/up, neighbor-index maps (XLA sort/searchsorted).
  * ``models``   — the occupancy-prediction network as gather+matmul kernels
                   over a flat multi-scale node array (one jit per frame).
  * ``coding``   — host-side C++ arithmetic coder (torchac float-CDF
                   convention), bitstream containers, weight codec.
  * ``runtime``  — GOP overfit engine (fully jit-compiled scan over frames),
                   production encode/decode pipelines, evaluation.
  * ``parallel`` — device-mesh sharding: frames of a GOP data-parallel over
                   ICI, sequences over hosts.
  * ``data``     — PLY IO, octree-pyramid preprocessing with npz caching.
"""

__version__ = "0.1.0"

# The geometry core packs voxel coordinates into 63-bit lexicographic keys,
# so 64-bit integer support must be on before any jnp array is created.
# All floating-point arrays in this package use explicit float32 dtypes;
# enabling x64 does not widen them.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Integer geometry preprocessing runs on the CPU backend (identical
# results, and it avoids paying a slow accelerator compile per array
# shape).  When the environment pins JAX to a TPU platform only, extend
# the platform list so a CPU device exists.
_plat = _os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    try:
        _jax.config.update("jax_platforms", _plat + ",cpu")
    except Exception:
        pass


def geometry_device():
    """Device used for integer geometry preprocessing (octree pyramids,
    neighbor maps at encode time).  CPU by default — the results are
    integers, identical on every backend, and CPU compiles are instant.
    Set LINR_GEOMETRY_DEVICE=default to keep it on the main device."""
    if _os.environ.get("LINR_GEOMETRY_DEVICE") == "default":
        return None
    try:
        return _jax.devices("cpu")[0]
    except Exception:
        return None

