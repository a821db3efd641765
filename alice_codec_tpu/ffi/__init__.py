"""C ABI shim build + loader (the reference's 20-function FFI surface).

Builds ``libalice_codec.so`` from alice_codec_ffi.cpp on demand (g++ against
the current CPython), for consumption by the Unity/UE5 wrappers in
bindings/.  ``get_ffi_lib()`` returns a ctypes handle for in-process tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "alice_codec_ffi.cpp"
# Per-interpreter artifact under a gitignored build dir: the shim links
# against the running CPython, so one .so per ABI tag, and rebuilds never
# touch version-controlled paths.
_SO = (_HERE / "build"
       / f"libalice_codec.{sysconfig.get_config_var('SOABI') or 'py'}.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_failed = False


def _build() -> None:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    include = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    version = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var(
        "VERSION"
    )
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        f"-I{include}",
        str(_SRC),
        "-o",
        str(_SO),
        f"-L{libdir}",
        f"-lpython{version}",
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    vp = ctypes.c_void_p

    for name in ("alice_codec_wavelet1d_haar", "alice_codec_wavelet1d_cdf53",
                 "alice_codec_wavelet1d_cdf97"):
        getattr(lib, name).restype = vp
        getattr(lib, name).argtypes = []
    lib.alice_codec_wavelet1d_destroy.argtypes = [vp]
    lib.alice_codec_wavelet1d_forward.argtypes = [vp, i32p, ctypes.c_uint32]
    lib.alice_codec_wavelet1d_inverse.argtypes = [vp, i32p, ctypes.c_uint32]

    lib.alice_codec_encoder_create.restype = vp
    lib.alice_codec_encoder_create.argtypes = [ctypes.c_uint8]
    lib.alice_codec_encoder_destroy.argtypes = [vp]
    lib.alice_codec_encode.restype = vp
    lib.alice_codec_encode.argtypes = [vp, u8p, ctypes.c_uint32,
                                       ctypes.c_uint32, ctypes.c_uint32,
                                       ctypes.c_uint32]
    lib.alice_codec_decode.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.alice_codec_decode.argtypes = [vp, u32p]

    lib.alice_codec_chunk_destroy.argtypes = [vp]
    lib.alice_codec_chunk_to_bytes.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.alice_codec_chunk_to_bytes.argtypes = [vp, u32p]
    lib.alice_codec_chunk_from_bytes.restype = vp
    lib.alice_codec_chunk_from_bytes.argtypes = [u8p, ctypes.c_uint32]
    for name in ("alice_codec_chunk_width", "alice_codec_chunk_height",
                 "alice_codec_chunk_frames"):
        getattr(lib, name).restype = ctypes.c_uint32
        getattr(lib, name).argtypes = [vp]

    lib.alice_codec_psnr.restype = ctypes.c_double
    lib.alice_codec_psnr.argtypes = [u8p, u8p, ctypes.c_uint32]
    lib.alice_codec_data_free.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                          ctypes.c_uint32]
    lib.alice_codec_string_free.argtypes = [ctypes.c_char_p]
    lib.alice_codec_version.restype = ctypes.c_void_p
    lib.alice_codec_version.argtypes = []
    return lib


def get_ffi_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the C ABI library; None if unavailable."""
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            _lib = _bind(ctypes.CDLL(str(_SO), mode=ctypes.RTLD_GLOBAL))
        except Exception:
            _failed = True
            return None
    return _lib
