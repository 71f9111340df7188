"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-world analogue of testing multi-node behavior without a
cluster: every sharding/collective path is exercised on fake CPU devices via
``--xla_force_host_platform_device_count`` (see SURVEY.md section 4).

The CI/benchmark image boots every Python interpreter with a TPU PJRT
plugin whose *remote compile* hook slows all XLA compiles (including CPU)
by ~50x.  The plugin is registered from sitecustomize before pytest starts,
so the only reliable way to shed it is to re-exec pytest once with a
scrubbed environment.
"""

import os

# The heavy lifting (scrubbing the TPU plugin env + re-exec) happens in
# _pytest_early_env.py, loaded via pytest.ini before capture starts.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the test box has ONE cpu core, and the
# trainer/codec graphs take tens of seconds each to compile — cache them
# across test runs (jax supports the persistent cache on CPU).
# Crash-safety: a process killed mid-write used to leave truncated
# entries that SEGFAULT/SIGABRT the NEXT run's deserialization (commit
# 33ede30; round-4 suite run killed at test 113/136).  The cache is now
# a copy-on-write per-run view with atomic promotion at clean exit —
# a killed run can only corrupt its own orphan dir, never the shared
# store (utils/jax_cache.py).
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from linr_pcgc_tpu.utils.jax_cache import setup_compilation_cache  # noqa: E402

_cache_base = os.environ.get(
    "LINR_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_cpu"),
)
setup_compilation_cache(_cache_base)
