"""ctypes bindings for the native IO core (native/creste_io.cpp).

The C library does libjpeg/libpng decode + fused RGBD assembly into
caller-owned NumPy buffers; ctypes calls release the GIL, so a plain
Python thread pool gets true parallel decode — replacing the reference's
num_workers torch DataLoader processes (SURVEY §2.7) with zero-copy,
zero-fork in-process loading. Falls back to PIL transparently when the
shared library hasn't been built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libcreste_io.so")


@lru_cache(maxsize=1)
def _lib():
    """Load (building if necessary) the native library; None on failure."""
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.jpeg_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.jpeg_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.png16_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.png16_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.assemble_rgbd.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.bin_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
    ]
    lib.bin_read.restype = ctypes.c_longlong
    return lib


def available() -> bool:
    return _lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def jpeg_shape(path: str) -> tuple[int, int, int]:
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = _lib().jpeg_info(path.encode(), h, w, c)
    if rc != 0:
        raise IOError(f"jpeg_info({path}) failed: {rc}")
    return h.value, w.value, c.value


def decode_jpeg(path: str) -> np.ndarray:
    h, w, _ = jpeg_shape(path)
    out = np.empty((h, w, 3), np.uint8)
    rc = _lib().jpeg_decode(path.encode(), _ptr(out, ctypes.c_uint8), h, w)
    if rc != 0:
        raise IOError(f"jpeg_decode({path}) failed: {rc}")
    return out


def png16_shape(path: str) -> tuple[int, int]:
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = _lib().png16_info(path.encode(), h, w)
    if rc != 0:
        raise IOError(f"png16_info({path}) failed: {rc}")
    return h.value, w.value


def decode_png16(path: str) -> np.ndarray:
    h, w = png16_shape(path)
    out = np.empty((h, w), np.uint16)
    rc = _lib().png16_decode(path.encode(), _ptr(out, ctypes.c_uint16), h, w)
    if rc != 0:
        raise IOError(f"png16_decode({path}) failed: {rc}")
    return out


def assemble_rgbd(jpeg_path: str, png_path: str | None) -> np.ndarray:
    """Fused decode -> [H, W, 4] float32 (RGB/255 + depth-mm channel)."""
    h, w, _ = jpeg_shape(jpeg_path)
    out = np.empty((h, w, 4), np.float32)
    rc = _lib().assemble_rgbd(
        jpeg_path.encode(), (png_path or "").encode(),
        _ptr(out, ctypes.c_float), h, w,
    )
    if rc != 0:
        raise IOError(f"assemble_rgbd({jpeg_path}, {png_path}) failed: {rc}")
    return out


def read_bin(path: str, max_floats: int = 131072 * 5) -> np.ndarray:
    out = np.empty((max_floats,), np.float32)
    n = _lib().bin_read(path.encode(), _ptr(out, ctypes.c_float), max_floats)
    if n < 0:
        raise IOError(f"bin_read({path}) failed: {n}")
    return out[:n].copy()


class ParallelAssembler:
    """Thread-pool RGBD assembly: ctypes drops the GIL, so N threads decode
    N samples concurrently (DataLoader-workers replacement)."""

    def __init__(self, num_threads: int = 8):
        self.pool = ThreadPoolExecutor(max_workers=num_threads)

    def assemble_batch(
        self, pairs: list[tuple[str, str | None]]
    ) -> np.ndarray:
        """[(jpeg, png), ...] -> [B, H, W, 4] float32."""
        results = list(self.pool.map(lambda p: assemble_rgbd(*p), pairs))
        return np.stack(results)

    def close(self):
        self.pool.shutdown()
