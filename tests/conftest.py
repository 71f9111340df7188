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
# KNOWN FAILURE MODE: a truncated/corrupt cache entry (e.g. a python
# process killed mid-write) SEGFAULTS jax's executable deserialization
# at cache READ time (jax_src/compilation_cache.get_executable_and_time;
# same class as commit 33ede30).  If the suite dies with "Fatal Python
# error: Segmentation fault" under compilation_cache.py, wipe
# .jax_cache_cpu and rerun cold (~60 min).
# LINR_TEST_JAX_CACHE: point a SECOND concurrent pytest at its own
# cache dir — two processes compiling into one dir is the likeliest
# source of the truncated entries above.
_cache_dir = os.environ.get(
    "LINR_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_cpu"),
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass
