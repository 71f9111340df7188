"""ctypes binding to the native arithmetic coder (csrc/ac.cpp).

The shared library is compiled on demand with g++ -O3 and cached next to the
source, keyed by a hash of the source text, so the build happens once per
machine/source revision.  See csrc/ac.cpp for the bitstream conventions
(float-CDF quantization identical to the reference's entropy backend, so the
formats are reproducible).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "ac.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")

_lib = None
_lib_lock = threading.Lock()


def _build_and_load() -> ctypes.CDLL:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"libac_{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-fopenmp",
            _SRC, "-o", tmp,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except subprocess.CalledProcessError:
            # Retry without OpenMP (still correct, just serial batches).
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)

    i64, i32, f32p, u8p, i16p, i64p = (
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int64),
    )
    lib.bac_encode.restype = i64
    lib.bac_encode.argtypes = [f32p, u8p, i64, u8p, i64]
    lib.bac_decode.restype = i32
    lib.bac_decode.argtypes = [f32p, i64, u8p, i64, u8p]
    lib.bac_estimate_bits.restype = ctypes.c_double
    lib.bac_estimate_bits.argtypes = [f32p, u8p, i64]
    lib.ac_encode_shared_cdf.restype = i64
    lib.ac_encode_shared_cdf.argtypes = [f32p, i32, i16p, i64, u8p, i64]
    lib.ac_decode_shared_cdf.restype = i32
    lib.ac_decode_shared_cdf.argtypes = [f32p, i32, i64, u8p, i64, i16p]
    lib.bac_encode_batch.restype = None
    lib.bac_encode_batch.argtypes = [f32p, u8p, i64p, i32, u8p, i64p, i64p]
    lib.bac_decode_batch.restype = None
    lib.bac_decode_batch.argtypes = [f32p, i64p, i32, u8p, i64p, u8p]
    lib.ac_num_threads.restype = i32
    lib.ac_num_threads.argtypes = []
    return lib


def _get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        with _lib_lock:
            if _lib is None:
                _lib = _build_and_load()
    return _lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i16p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _as_prob(prob) -> np.ndarray:
    p = np.ascontiguousarray(np.asarray(prob, dtype=np.float32).reshape(-1))
    return p


def _as_bits(bits) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(bits).reshape(-1).astype(np.uint8))


def binary_encode(prob, bits) -> bytes:
    """Arithmetic-code occupancy ``bits`` under per-symbol P(bit=1)."""
    p = _as_prob(prob)
    b = _as_bits(bits)
    assert p.shape == b.shape
    n = p.shape[0]
    out = np.empty(3 * n + 64, np.uint8)
    size = _get_lib().bac_encode(_f32p(p), _u8p(b), n, _u8p(out), out.shape[0])
    if size < 0:
        raise RuntimeError("arithmetic encoder overflow")
    return out[:size].tobytes()


def binary_decode(prob, stream: bytes) -> np.ndarray:
    """Inverse of :func:`binary_encode`; returns uint8 bits."""
    p = _as_prob(prob)
    n = p.shape[0]
    src = np.frombuffer(stream, np.uint8)
    out = np.empty(n, np.uint8)
    _get_lib().bac_decode(_f32p(p), n, _u8p(src), src.shape[0], _u8p(out))
    return out


def binary_estimate_bits(prob, bits) -> float:
    """Cross-entropy estimate of the code length in bits (cf. the
    reference's estimate_bitrate)."""
    p = _as_prob(prob)
    b = _as_bits(bits)
    return float(_get_lib().bac_estimate_bits(_f32p(p), _u8p(b), p.shape[0]))


# Reusable output buffer for binary_encode_batch: a fresh np.empty per
# call costs a first-touch page fault per 4 KB of the (worst-case-sized,
# 3n+64 per stream) buffer — measured 13 vs 48 M sym/s cold vs warm.
# THREAD-LOCAL so a second concurrent encoder (e.g. evaluate alongside
# encode) gets its own buffer instead of silently corrupting streams
# before .tobytes() copies them out (round-3 advisor).  The buffer grows
# to the largest batch a thread ever encodes and is kept warm on purpose;
# it is released with the thread.
_enc_tls = threading.local()


def _enc_out(total: int) -> np.ndarray:
    buf = getattr(_enc_tls, "buf", None)
    if buf is None or buf.size < total:
        buf = np.zeros(int(total * 5 // 4), np.uint8)
        _enc_tls.buf = buf
    return buf


def binary_encode_batch(probs: list, bits: list) -> list[bytes]:
    """Encode many independent streams with one multithreaded native call.

    Reentrant: safe to call from multiple Python threads (each thread has
    its own reusable output buffer; the native batch loop is stateless).
    """
    m = len(probs)
    if m == 0:
        return []
    ps = [_as_prob(p) for p in probs]
    bs = [_as_bits(b) for b in bits]
    lens = np.array([0] + [len(p) for p in ps], np.int64)
    offsets = np.cumsum(lens)
    pcat = np.concatenate(ps) if offsets[-1] else np.zeros(0, np.float32)
    bcat = np.concatenate(bs) if offsets[-1] else np.zeros(0, np.uint8)
    caps = np.array([0] + [3 * len(p) + 64 for p in ps], np.int64)
    out_offsets = np.cumsum(caps)
    out = _enc_out(int(out_offsets[-1]))
    sizes = np.empty(m, np.int64)
    _get_lib().bac_encode_batch(
        _f32p(pcat), _u8p(bcat), _i64p(offsets), m, _u8p(out),
        _i64p(out_offsets), _i64p(sizes),
    )
    if np.any(sizes < 0):
        raise RuntimeError("arithmetic encoder overflow in batch")
    return [
        out[out_offsets[k]: out_offsets[k] + sizes[k]].tobytes()
        for k in range(m)
    ]


def binary_decode_batch(probs: list, streams: list) -> list[np.ndarray]:
    """Decode many independent streams with one multithreaded native call."""
    m = len(probs)
    if m == 0:
        return []
    ps = [_as_prob(p) for p in probs]
    lens = np.array([0] + [len(p) for p in ps], np.int64)
    offsets = np.cumsum(lens)
    pcat = np.concatenate(ps) if offsets[-1] else np.zeros(0, np.float32)
    in_lens = np.array([0] + [len(s) for s in streams], np.int64)
    in_offsets = np.cumsum(in_lens)
    scat = (
        np.frombuffer(b"".join(bytes(s) for s in streams), np.uint8)
        if in_offsets[-1]
        else np.zeros(0, np.uint8)
    )
    out = np.empty(int(offsets[-1]), np.uint8)
    _get_lib().bac_decode_batch(
        _f32p(pcat), _i64p(offsets), m, _u8p(scat), _i64p(in_offsets), _u8p(out)
    )
    return [np.array(out[offsets[k]: offsets[k + 1]]) for k in range(m)]


def shared_cdf_encode(cdf, syms) -> bytes:
    """Encode int16 symbols under one shared float CDF row (Lp entries)."""
    c = np.ascontiguousarray(np.asarray(cdf, np.float32).reshape(-1))
    s = np.ascontiguousarray(np.asarray(syms, np.int16).reshape(-1))
    n = s.shape[0]
    out = np.empty(3 * n + 64, np.uint8)
    size = _get_lib().ac_encode_shared_cdf(
        _f32p(c), c.shape[0], _i16p(s), n, _u8p(out), out.shape[0]
    )
    if size == -2:
        raise ValueError("symbol out of range for CDF")
    if size < 0:
        raise RuntimeError("arithmetic encoder overflow")
    return out[:size].tobytes()


def shared_cdf_decode(cdf, n: int, stream: bytes) -> np.ndarray:
    """Inverse of :func:`shared_cdf_encode`; returns int16 symbols."""
    c = np.ascontiguousarray(np.asarray(cdf, np.float32).reshape(-1))
    src = np.frombuffer(stream, np.uint8)
    out = np.empty(n, np.int16)
    _get_lib().ac_decode_shared_cdf(
        _f32p(c), c.shape[0], n, _u8p(src), src.shape[0], _i16p(out)
    )
    return out
