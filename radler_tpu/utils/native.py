"""ctypes bindings for the native host helpers (``native/radler_host.cc``).

Importing this module raises ImportError when the shared library has not been
built (``make -C native``); callers fall back to NumPy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Wheel installs bundle the library inside the package (_native/, see
# scripts/make_wheels.sh); source checkouts build it under <repo>/native/.
_CANDIDATES = (
    os.path.join(_PKG_DIR, "_native", "libradler_host.so"),
    os.path.join(os.path.dirname(_PKG_DIR), "native", "libradler_host.so"),
)
_LIB_PATH = next((p for p in _CANDIDATES if os.path.exists(p)), None)

if _LIB_PATH is None:
    # Try a one-shot build of the source-tree copy; tolerate failure
    # (pure-Python fallbacks exist).
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(_CANDIDATES[1])],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass
    if os.path.exists(_CANDIDATES[1]):
        _LIB_PATH = _CANDIDATES[1]
if _LIB_PATH is None:
    raise ImportError("native helpers not built; run `make -C native`")

_lib = ctypes.CDLL(_LIB_PATH)

_lib.radler_dijkstra_divide_vertically.argtypes = [
    ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
]
_lib.radler_rle_compress.argtypes = [
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_longlong,
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_longlong,
    ctypes.POINTER(ctypes.c_uint8),
]
_lib.radler_rle_compress.restype = ctypes.c_longlong
_lib.radler_rle_decompress.argtypes = [
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_longlong,
    ctypes.c_uint8,
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_longlong,
]
_lib.radler_rle_decompress.restype = ctypes.c_int
_lib.radler_floodfill_2d.argtypes = [
    ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_float,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
]
_lib.radler_floodfill_2d.restype = ctypes.c_longlong


def _f32_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class dijkstra_native:
    """Namespace mirroring the subset of DijkstraSplitter done natively."""

    @staticmethod
    def divide_vertically(
        image: np.ndarray,
        output: np.ndarray,
        width: int,
        height: int,
        x1: int,
        x2: int,
    ) -> None:
        image_c = np.ascontiguousarray(image, dtype=np.float32)
        if not (
            output.flags["C_CONTIGUOUS"] and output.dtype == np.float32
        ):
            raise ValueError("output must be contiguous float32")
        _lib.radler_dijkstra_divide_vertically(
            _f32_ptr(image_c), _f32_ptr(output), width, height, x1, x2
        )


def rle_compress(mask: np.ndarray):
    """Returns (bytes, first_value)."""
    flat = np.ascontiguousarray(mask.reshape(-1), dtype=np.uint8)
    capacity = flat.size * 9 + 16
    out = np.empty(capacity, dtype=np.uint8)
    first = ctypes.c_uint8(0)
    size = _lib.radler_rle_compress(
        _u8_ptr(flat), flat.size, _u8_ptr(out), capacity, ctypes.byref(first)
    )
    if size < 0:
        raise RuntimeError("RLE compression buffer overflow")
    return bytes(out[:size].tobytes()), bool(first.value)


def rle_decompress(data: bytes, first_value: bool, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8)
    status = _lib.radler_rle_decompress(
        _u8_ptr(np.ascontiguousarray(buf)),
        len(data),
        int(first_value),
        _u8_ptr(out),
        n,
    )
    if status != 0:
        raise RuntimeError("Malformed RLE data")
    return out.astype(bool)


def floodfill_2d(
    image: np.ndarray,
    mask: np.ndarray,
    threshold: float,
    x: int,
    y: int,
    use_abs: bool,
) -> int:
    """Flood fill marking ``mask`` (uint8, modified in place); returns area."""
    image_c = np.ascontiguousarray(image, dtype=np.float32)
    h, w = image_c.shape
    return int(
        _lib.radler_floodfill_2d(
            _f32_ptr(image_c),
            _u8_ptr(mask),
            threshold,
            x,
            y,
            w,
            h,
            int(use_abs),
        )
    )
