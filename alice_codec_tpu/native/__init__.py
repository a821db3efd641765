"""Native (C++) runtime components: build-on-demand + ctypes bindings.

The reference implements its runtime in native code (Rust); here the
host-serial components — the byte-oriented rANS entropy coder — are C++
(Rust is unavailable in this environment), compiled on first use with the
system g++ and loaded via ctypes.  Everything degrades gracefully to the
pure-NumPy fallback in ops/rans.py if no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "alice_rans.cpp"
_SO = _HERE / f"_alice_native_{sysconfig.get_platform().replace('-', '_')}.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _build() -> None:
    base = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fno-exceptions",
        str(_SRC),
        "-o",
        str(_SO),
    ]
    # OpenMP parallelizes the N-way interleaved rANS lanes across cores;
    # fall back to a serial build if unavailable.
    try:
        subprocess.run(
            base[:1] + ["-fopenmp"] + base[1:], check=True, capture_output=True,
            timeout=300,
        )
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True, capture_output=True, timeout=300)


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32

    lib.alc_freq_table.argtypes = [u32p, i32, u16p, u16p, u8p, i32]
    lib.alc_freq_table.restype = None

    lib.alc_rans_encode_put.argtypes = [u32p, u8p, i64, u16p, u16p, u8p,
                                        ctypes.POINTER(i32)]
    lib.alc_rans_encode_put.restype = i64

    lib.alc_rans_finish.argtypes = [ctypes.c_uint32, u8p, i64]
    lib.alc_rans_finish.restype = i64

    lib.alc_rans_encode.argtypes = [u8p, i64, u16p, u16p, u8p,
                                    ctypes.POINTER(i32)]
    lib.alc_rans_encode.restype = i64

    lib.alc_rans_decode_n.argtypes = [u8p, i64, i64, u16p, u16p, u8p, u8p, u32p,
                                      ctypes.POINTER(i64)]
    lib.alc_rans_decode_n.restype = None

    lib.alc_rans_encode4.argtypes = [u8p, i64, u16p, u16p, u8p]
    lib.alc_rans_encode4.restype = i64

    lib.alc_rans_decode4.argtypes = [u8p, i64, i64, u16p, u16p, u8p, u8p]
    lib.alc_rans_decode4.restype = None

    lib.alc_rans_encode_nway.argtypes = [u8p, i64, i32, u16p, u16p, u8p, u32p]
    lib.alc_rans_encode_nway.restype = i64

    lib.alc_rans_decode_nway.argtypes = [u8p, i64, i32, u32p, u16p, u16p, u8p, u8p]
    lib.alc_rans_decode_nway.restype = None

    lib.alc_native_abi_version.argtypes = []
    lib.alc_native_abi_version.restype = i32
    return lib


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("ALC_DISABLE_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            _lib = _bind(ctypes.CDLL(str(_SO)))
            assert _lib.alc_native_abi_version() == 2
        except Exception:
            _build_failed = True
            return None
    return _lib
