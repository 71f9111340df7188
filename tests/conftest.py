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
