"""Early pytest plugin (loaded via ``-p`` in pytest.ini, before output
capture starts): scrub the TPU PJRT plugin environment and re-exec.

The benchmark image's sitecustomize registers a remote-compile PJRT plugin
in every interpreter, which slows *all* XLA compiles (even CPU) by ~50x.
Tests run on a virtual 8-device CPU mesh, so we re-exec pytest once with a
clean environment.  Doing it from this early plugin (not tests/conftest.py)
keeps stdout attached: at -p load time pytest has not yet replaced fd 1/2
with capture files.
"""

import os
import sys

# The suite JITs hundreds of large unrolled graphs in one process; XLA's
# CPU compiler recurses deeply on them, and the default 8 MB stack has
# produced flaky late-run SIGSEGVs inside backend_compile / cache
# deserialization on this box.  The hard limit is unlimited — lift the
# soft limit before jax initializes.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and (
        _hard == resource.RLIM_INFINITY or _hard >= _want
    ):
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except Exception:
    pass

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "_LINR_TESTS_REEXECED"
):
    env = dict(os.environ)
    env["_LINR_TESTS_REEXECED"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        p
        for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon_site" not in p
    )
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )
