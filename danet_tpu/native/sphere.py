"""ctypes bindings for the native SPHERE decoder (sphere_decoder.cpp).

Builds libsphere.so on first use if missing (g++ via the Makefile here).
Usage:
    from danet_tpu.native.sphere import read_sphere
    rate, samples = read_sphere("file.wv1")   # samples: int16 [n] or [n, ch]
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsphere.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    subprocess.run(["make", "-s"], cwd=_DIR, check=True)


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            if not os.path.exists(_SO):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.sphere_read.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.sphere_read.restype = ctypes.c_int
            lib.sphere_free.argtypes = [ctypes.POINTER(ctypes.c_int16)]
            lib.sphere_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.sphere_read_batch.restype = ctypes.c_int
            _LIB = lib
    return _LIB


def read_sphere(path: str):
    """Decode a NIST SPHERE file (PCM / ulaw / alaw / embedded-shorten-v2).

    Returns (sample_rate, samples): int16 ndarray, shape [n] for mono or
    [n, channels] for multichannel.
    """
    lib = _lib()
    rate = ctypes.c_int32()
    chans = ctypes.c_int32()
    n = ctypes.c_int64()
    buf = ctypes.POINTER(ctypes.c_int16)()
    err = ctypes.create_string_buffer(256)
    rc = lib.sphere_read(path.encode(), ctypes.byref(rate),
                         ctypes.byref(chans), ctypes.byref(n),
                         ctypes.byref(buf), err, len(err))
    if rc != 0:
        raise IOError("sphere_read(%s): %s" % (path, err.value.decode()))
    try:
        total = n.value * chans.value
        arr = np.ctypeslib.as_array(buf, shape=(total,)).copy()
    finally:
        lib.sphere_free(buf)
    if chans.value > 1:
        arr = arr.reshape(n.value, chans.value)
    return rate.value, arr


def read_sphere_batch(paths, n_threads: int = 8):
    """Thread-pooled batch decode (C++ worker pool, no GIL contention).

    Returns a list parallel to `paths`: (rate, int16 ndarray) per success,
    or an IOError instance per failed file.
    """
    lib = _lib()
    n = len(paths)
    if n == 0:
        return []
    errlen = 256
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rates = (ctypes.c_int32 * n)()
    chans = (ctypes.c_int32 * n)()
    counts = (ctypes.c_int64 * n)()
    bufs = (ctypes.POINTER(ctypes.c_int16) * n)()
    errs = ctypes.create_string_buffer(n * errlen)
    lib.sphere_read_batch(
        c_paths, n, n_threads,
        ctypes.cast(rates, ctypes.POINTER(ctypes.c_int32)),
        ctypes.cast(chans, ctypes.POINTER(ctypes.c_int32)),
        ctypes.cast(counts, ctypes.POINTER(ctypes.c_int64)),
        ctypes.cast(bufs, ctypes.POINTER(ctypes.POINTER(ctypes.c_int16))),
        errs, errlen)
    out = []
    for i in range(n):
        if not bufs[i]:
            msg = errs.raw[i * errlen:(i + 1) * errlen].split(b"\0")[0]
            out.append(IOError("sphere_read(%s): %s"
                               % (paths[i], msg.decode())))
            continue
        total = counts[i] * chans[i]
        arr = np.ctypeslib.as_array(bufs[i], shape=(total,)).copy()
        lib.sphere_free(bufs[i])
        if chans[i] > 1:
            arr = arr.reshape(counts[i], chans[i])
        out.append((rates[i], arr))
    return out
