"""Crash-safe persistent XLA compilation cache.

jax's persistent cache is not safe against a process killed mid-write: a
truncated entry SEGFAULTs/SIGABRTs executable (de)serialization at cache
READ time on the *next* run (observed twice: commit 33ede30, and the
round-4 full-suite run dying in ``compilation_cache.put_executable_and_time``
after a timeout-killed pytest poisoned the shared dir).  Two processes
compiling into one dir race the same way.

Fix: COPY-ON-WRITE run dirs with atomic promotion.

  * the shared store lives at ``<base>/shared`` and only ever receives
    entries via ``os.rename`` (atomic on one filesystem) of fully written
    files — it can never hold a truncated entry;
  * each process gets its own ``<base>/run-<pid>-<token>`` dir, seeded by
    HARDLINKS of every shared entry (zero copies, instant warm start);
    jax reads/writes only this dir, so concurrent processes never share a
    writable file;
  * at clean interpreter exit, new entries are promoted into the shared
    store (write-into-temp + rename — the entry is already fully on disk,
    the rename just publishes it) and the run dir is deleted;
  * a killed process leaves only its orphan run dir behind (possibly with
    a truncated file NOBODY will ever read); orphans are swept on the
    next setup by liveness-checking the pid in the dir name.

Used by tests/conftest.py, bench.py and the production CLI.
"""

from __future__ import annotations

import atexit
import errno
import os
import secrets


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError as e:
        return e.errno == errno.EPERM
    return True


def _sweep_orphans(base: str) -> None:
    try:
        names = os.listdir(base)
    except OSError:
        return
    for name in names:
        if not name.startswith("run-"):
            continue
        try:
            pid = int(name.split("-")[1])
        except (IndexError, ValueError):
            pid = -1
        if pid > 0 and _pid_alive(pid):
            continue
        run = os.path.join(base, name)
        try:
            for f in os.listdir(run):
                try:
                    os.unlink(os.path.join(run, f))
                except OSError:
                    pass
            os.rmdir(run)
        except OSError:
            pass


def setup_compilation_cache(base: str, min_compile_secs: float = 2.0) -> str:
    """Point jax's persistent compilation cache at a crash-safe per-run
    view of ``base``.  Returns the run dir (or ``base`` itself if the
    copy-on-write setup fails for any reason — degraded, not fatal).
    Call BEFORE the first jit compilation; safe to call before
    ``import jax`` elsewhere (imports jax itself)."""
    import jax

    shared = os.path.join(base, "shared")
    run_dir = os.path.join(base, f"run-{os.getpid()}-{secrets.token_hex(4)}")
    try:
        os.makedirs(shared, exist_ok=True)
        os.makedirs(run_dir, exist_ok=True)
        _sweep_orphans(base)
        # migrate a legacy flat cache (entries directly under base) into
        # the shared store; rename is atomic and a lost race is benign
        for name in os.listdir(base):
            src = os.path.join(base, name)
            if name.startswith(("run-", "shared")) or not os.path.isfile(src):
                continue
            try:
                os.rename(src, os.path.join(shared, name))
            except OSError:
                pass
        for name in os.listdir(shared):
            try:
                os.link(
                    os.path.join(shared, name), os.path.join(run_dir, name)
                )
            except OSError:
                pass
        cache_dir = run_dir
    except OSError:
        cache_dir = base

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        return cache_dir

    if cache_dir == run_dir:
        atexit.register(_promote_and_cleanup, shared, run_dir)
    return cache_dir


def _promote_and_cleanup(shared: str, run_dir: str) -> None:
    try:
        names = os.listdir(run_dir)
    except OSError:
        return
    for name in names:
        src = os.path.join(run_dir, name)
        dst = os.path.join(shared, name)
        try:
            if not os.path.exists(dst) and os.path.isfile(src):
                # the file is fully written (we are at clean exit); a
                # same-dir hardlink + rename publishes it atomically
                tmp = dst + f".tmp-{os.getpid()}"
                os.link(src, tmp)
                os.rename(tmp, dst)
            os.unlink(src)
        except OSError:
            pass
    try:
        os.rmdir(run_dir)
    except OSError:
        pass
