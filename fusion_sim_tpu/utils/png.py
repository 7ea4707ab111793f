"""PNG encoding for frame streaming: native fast path + pure-Python fallback.

The native path (native/png_encoder.cpp, loaded via ctypes — the image has
no pybind11) does adaptive scanline filtering + zlib in C++; the fallback
uses filter-0 scanlines with Python's zlib.  Both produce standard PNGs.
The library is built on demand with ``make -C native`` the first time it is
requested.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import zlib

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfspng.so"))
_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fspng_encode_rgb.restype = ctypes.c_size_t
        lib.fspng_encode_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _encode_python(rgb: np.ndarray, level: int) -> bytes:
    h, w = rgb.shape[:2]
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1).tobytes()
    idat = zlib.compress(raw, level)
    out = [b"\x89PNG\r\n\x1a\n"]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out.append(chunk(b"IHDR", ihdr))
    out.append(chunk(b"IDAT", idat))
    out.append(chunk(b"IEND", b""))
    return b"".join(out)


def encode_png(rgb: np.ndarray, level: int = 3) -> bytes:
    """Encode an (h, w, 3) uint8 array as PNG bytes."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {rgb.shape}")
    lib = _load_native()
    if lib is not None:
        h, w = rgb.shape[:2]
        cap = rgb.nbytes + 4096
        out = (ctypes.c_uint8 * cap)()
        n = lib.fspng_encode_rgb(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
            level, out, cap)
        if n:
            return bytes(bytearray(out[:n]))
    return _encode_python(rgb, level)


def native_available() -> bool:
    return _load_native() is not None
