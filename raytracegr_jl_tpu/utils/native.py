"""ctypes bindings to the native C++ runtime (native/*.cc).

The compute path is JAX/XLA/Pallas; the runtime around it (image I/O here)
is native C++. The shared library is built on demand with the repo's
toolchain (g++ + zlib) and cached next to the sources; loading falls back
gracefully (callers use PIL) if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpngcodec.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "png_codec.cc"))

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-Wall", "-fPIC", "-shared", _SRC_PATH,
             "-o", _LIB_PATH, "-lz"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load():
    """Load (building if needed) the native codec; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC_PATH)
                and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)):
            if not _build() and not os.path.exists(_LIB_PATH):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.rtgr_png_encode.restype = ctypes.c_int
        lib.rtgr_png_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.rtgr_png_decode.restype = ctypes.c_int
        lib.rtgr_png_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.rtgr_free.restype = None
        lib.rtgr_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return _lib


def png_encode(img: np.ndarray) -> bytes | None:
    """uint8 [H, W, 3] -> PNG bytes, or None if the codec is unavailable."""
    lib = load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "native codec is RGB-only"
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.rtgr_png_encode(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        return None
    try:
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.rtgr_free(out)


def png_decode(data: bytes) -> np.ndarray | None:
    """PNG bytes -> uint8 [H, W, 3], or None if unavailable/unsupported."""
    lib = load()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.rtgr_png_decode(buf, len(data), ctypes.byref(out),
                             ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    try:
        flat = np.ctypeslib.as_array(out, shape=(h.value * w.value * 3,))
        return flat.reshape(h.value, w.value, 3).copy()
    finally:
        lib.rtgr_free(out)
