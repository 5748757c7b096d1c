"""Native (C++) runtime components, loaded via ctypes.

Build-on-first-use: the shared library is compiled with g++ into the package
directory and cached; every consumer falls back to the pure-Python
implementation when the toolchain or build is unavailable, so the native
layer is a transparent accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).parent
_SRC = _HERE / "src" / "topo_native.cc"
_LIB = _HERE / "libtopo_native.so"

_lock = threading.Lock()
_lib = None
_tried = False


class TiffInfoStruct(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("has_pixel_scale", ctypes.c_int32),
        ("has_tiepoint", ctypes.c_int32),
        ("has_model_transform", ctypes.c_int32),
        ("pixel_scale", ctypes.c_double * 3),
        ("tiepoint", ctypes.c_double * 6),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                "-o", str(_LIB), str(_SRC), "-lz",
            ],
            check=True,
            capture_output=True,
            timeout=180,
        )
        return True
    except Exception:
        return False


def load():
    """The ctypes library handle, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("TOPO_DISABLE_NATIVE"):
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.topo_tiff_probe.restype = ctypes.c_int
        lib.topo_tiff_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(TiffInfoStruct),
        ]
        lib.topo_tiff_decode.restype = ctypes.c_int
        lib.topo_tiff_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ]
        lib.topo_last_error.restype = ctypes.c_char_p
        lib.topo_draw_line.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
        ]
        lib.topo_fill_round_rect.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float,
            ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
        ]
        lib.topo_blit_glyph.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def tiff_decode(data: bytes):
    """Decode a GeoTIFF natively.

    Returns ``(heights f32[H, W], info dict)`` or None if native decoding is
    unavailable or the file is unsupported (callers fall back to Python).
    """
    import numpy as np

    lib = load()
    if lib is None:
        return None
    info = TiffInfoStruct()
    if lib.topo_tiff_probe(data, len(data), ctypes.byref(info)) != 0:
        return None
    out = np.empty((info.height, info.width), np.float32)
    rc = lib.topo_tiff_decode(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
    )
    if rc != 0:
        return None
    return out, {
        "width": int(info.width),
        "height": int(info.height),
        "pixel_scale": list(info.pixel_scale) if info.has_pixel_scale else None,
        "tiepoint": list(info.tiepoint) if info.has_tiepoint else None,
        "has_model_transform": bool(info.has_model_transform),
    }
