"""Native (C++) runtime components, compiled on demand.

The reference implements its entire runtime in C++; here the JAX/XLA/Pallas
compute path carries the math, and this package holds the C++ equivalents of
the host-side runtime hot paths (currently the edge wire codec — the
counterpart of `/root/reference/include/Socket/slampkt_vi.h` +
`src/Socket/client.cc` framing).

Build model: no pybind11 / no pip — a single `g++ -O3 -shared -fPIC`
invocation produces `_wirecodec.so` next to the source, cached and keyed on
the source hash, loaded via ctypes.  Every entry point has a pure-numpy
fallback in `edge/wire.py`, so the framework is fully functional on hosts
without a toolchain; `load_wirecodec()` returns None there.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wirecodec.cpp")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build(src: str, tag: str) -> str | None:
    """Compile `src` to a cached .so; returns its path or None."""
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_DIR, f"_{tag}-{digest}.so")
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)  # atomic under concurrent builders
    except (OSError, subprocess.SubprocessError):
        return None
    finally:
        try:  # a failed/killed g++ must not leave the partial tmp behind
            if os.path.exists(tmp):
                os.unlink(tmp)
        except OSError:
            pass
    # drop stale builds of older source revisions (incl. orphaned tmps)
    for name in os.listdir(_DIR):
        if name.startswith(f"_{tag}-") and name != os.path.basename(out) \
                and (name.endswith(".so") or ".so.tmp" in name):
            try:
                os.unlink(os.path.join(_DIR, name))
            except OSError:
                pass
    return out


def load_wirecodec():
    """ctypes handle to the wire codec, or None if no toolchain.

    Thread-safe and memoized; a failed build is remembered so callers on a
    toolchain-less host don't pay a compile attempt per packet.
    """
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("ORBSLAM3_TPU_NO_NATIVE"):
            _lib_failed = True
            return None
        path = _build(_SRC, "wirecodec")
        if path is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _lib_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.svi_header.restype = ctypes.c_int
        lib.svi_header.argtypes = [u8p, ctypes.c_int64, i32p, i64p, i32p,
                                   i32p]
        lib.svi_decode.restype = ctypes.c_int
        lib.svi_decode.argtypes = [u8p, ctypes.c_int64, f32p, u8p, i64p,
                                   f32p, f32p]
        lib.svi_encode.restype = ctypes.c_int64
        lib.svi_encode.argtypes = [ctypes.c_int32, ctypes.c_int64, f32p,
                                   u8p, ctypes.c_int32, i64p, f32p, f32p,
                                   ctypes.c_int32, u8p]
        lib.svi_scan_stream.restype = ctypes.c_int32
        lib.svi_scan_stream.argtypes = [u8p, ctypes.c_int64, i64p,
                                        ctypes.c_int32, i64p]
        _lib = lib
        return _lib
