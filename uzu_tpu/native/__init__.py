"""Native (C++) runtime components, built on demand with g++.

The reference implements its runtime layer in Rust/C++ (loader, grammar via
xgrammar FFI); here the hot host-side paths are C++ shared libraries loaded
through ctypes, with pure-Python fallbacks when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "build")
_lock = threading.Lock()
_cache: dict = {}


def _build(name: str, extra_flags=()) -> str | None:
    src = os.path.join(_DIR, f"{name}.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_BUILD, f"{name}-{digest}.so")
    if os.path.exists(out):
        return out
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           *extra_flags, src, "-o", out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        sys.stderr.write(f"uzu_tpu.native: build of {name} failed ({e}); using python fallback\n")
        return None
    os.replace(out + ".tmp", out)
    return out


def load(name: str, extra_flags=()) -> ctypes.CDLL | None:
    """Build (if needed) and dlopen a native component; None on failure."""
    with _lock:
        if name in _cache:
            return _cache[name]
        path = _build(name, extra_flags)
        lib = ctypes.CDLL(path) if path else None
        _cache[name] = lib
        return lib


def io_loader() -> ctypes.CDLL | None:
    lib = load("io_loader")
    if lib is not None and not getattr(lib, "_configured", False):
        lib.uz_read_parallel.restype = ctypes.c_int
        lib.uz_read_parallel.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
        ]
        lib._configured = True
    return lib
