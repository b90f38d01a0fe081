"""Native (C++) runtime helpers, loaded via ctypes.

Build on first use with the system toolchain (g++); every entry point has a
pure-Python fallback, so the framework works without a compiler. Use
`available()` to check, `build()` to force a rebuild.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "scn_io.cpp")
_SO = os.path.join(_DIR, "_scn_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    if not force and os.path.exists(_SO) and (
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.scn_parse.restype = ctypes.c_int
        lib.scn_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.scn_free.restype = None
        lib.scn_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        for name in ("ppm_write_p3", "ppm_write_p6"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_char_p,
                           ctypes.POINTER(ctypes.c_uint8),
                           ctypes.c_int64, ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def scn_parse(text: str):
    """Parse scene text natively -> (cam[6] f32, spheres [N,11] f32).

    Raises ValueError with the native error code on malformed input;
    returns None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    cam = (ctypes.c_float * 6)()
    spheres_ptr = ctypes.POINTER(ctypes.c_float)()
    count = ctypes.c_int64()
    rc = lib.scn_parse(raw, len(raw), cam, ctypes.byref(spheres_ptr),
                       ctypes.byref(count))
    if rc != 0:
        msgs = {
            -1: "expected 'camera' line", -2: "camera needs 6 floats",
            -3: "expected 'size' line", -4: "size needs an integer",
            -5: "sphere count out of range", -6: "out of memory",
            -7: "expected 'sphere' line", -8: "sphere needs 11 fields",
            -9: "material must be 0..3",
        }
        raise ValueError(
            f"scene parse failed: {msgs.get(rc, f'error {rc}')}")
    try:
        n = count.value
        flat = np.ctypeslib.as_array(spheres_ptr, shape=(n, 11)).copy()
    finally:
        lib.scn_free(spheres_ptr)
    return np.asarray(cam, dtype=np.float32).copy(), flat


def ppm_write(path: str, img_u8: np.ndarray, binary: bool = False) -> bool:
    """Write bottom-up uint8 [H,W,3] as P3 (or P6) PPM. False if no native."""
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(img_u8, dtype=np.uint8)
    h, w, _ = img.shape
    fn = lib.ppm_write_p6 if binary else lib.ppm_write_p3
    rc = fn(str(path).encode(), img.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint8)), w, h)
    if rc < 0:
        raise IOError(f"native ppm write failed: {rc}")
    return True
