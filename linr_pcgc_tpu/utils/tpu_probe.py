"""Bounded TPU-availability probe (round-3 verdict, missing #1 / weak #7).

The axon tunnel to the TPU dies for hours at a time, and a bare
``jax.devices()`` call in that state HANGS (no error) for the caller's
whole timeout budget — observed to burn the driver's entire bench window
(BENCH_r03.json rc=1).  Every entry point that needs the chip should
call :func:`wait_for_tpu` first: it probes in a SUBPROCESS (the hang
cannot be interrupted in-process once jax initializes the backend) with
a short per-attempt timeout, retries for a bounded window, and lets the
caller fail with a one-line diagnosis instead of a traceback.

Environment knobs:
  LINR_TPU_WAIT_S      total seconds to keep probing (default 1200)
  LINR_TPU_PROBE_S     per-attempt subprocess timeout (default 90)
  LINR_TPU_RETRY_S     sleep between attempts (default 60)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_PROBE_CODE = (
    "import jax; d = jax.devices(); "
    "assert d and d[0].platform != 'cpu', d; "
    "print(d[0].platform)"
)


def probe_tpu_once(timeout_s: float = 90.0) -> bool:
    """One subprocess probe: True iff a non-CPU jax backend answers."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_tpu(
    max_wait_s: float | None = None,
    probe_timeout_s: float | None = None,
    retry_s: float | None = None,
    log=None,
) -> bool:
    """Probe until the TPU answers or ``max_wait_s`` elapses.

    Returns True when the backend is up.  Returns False (never raises) on
    timeout so callers can emit their own one-line diagnosis.
    """
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("LINR_TPU_WAIT_S", "1200"))
    if probe_timeout_s is None:
        probe_timeout_s = float(os.environ.get("LINR_TPU_PROBE_S", "90"))
    if retry_s is None:
        retry_s = float(os.environ.get("LINR_TPU_RETRY_S", "60"))
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        if probe_tpu_once(probe_timeout_s):
            if log and attempt > 1:
                log(f"TPU tunnel up after {attempt} probes")
            return True
        if time.time() + retry_s >= deadline:
            return False
        if log:
            left = int(deadline - time.time())
            log(
                f"TPU probe {attempt} failed ({time.time()-t0:.0f}s); "
                f"retrying in {retry_s:.0f}s ({left}s left in budget)"
            )
        time.sleep(retry_s)


def require_tpu_or_exit(what: str, log=print) -> None:
    """Bench/driver helper: wait for the TPU, exit(1) with ONE line if the
    tunnel never comes up within the budget."""
    if wait_for_tpu(log=log):
        return
    budget = os.environ.get("LINR_TPU_WAIT_S", "1200")
    print(
        f"{what}: TPU tunnel down — no non-CPU jax backend answered within "
        f"LINR_TPU_WAIT_S={budget}s (axon probe subprocess timed out/failed); "
        f"not a code failure",
        file=sys.stderr,
        flush=True,
    )
    raise SystemExit(1)
