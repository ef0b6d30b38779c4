"""Run-length-compressed boolean masks.

Behavioral equivalent of ``cpp/utils/compressed_mask*``: per-scale auto-masks
at full image size are held compressed (alternating-run counts with 1/3/9-byte
encoding), and boxed get/set allow the facet layer to exchange sub-regions.
The codec runs in C++ (``native/radler_host.cc``) with a NumPy fallback.
"""

from __future__ import annotations

import numpy as np

try:
    from . import native as _native
except Exception:  # pragma: no cover
    _native = None


def _compress_py(mask: np.ndarray):
    flat = np.asarray(mask, dtype=bool).reshape(-1)
    if flat.size == 0:
        return b"", False
    changes = np.flatnonzero(np.diff(flat.view(np.int8)))
    boundaries = np.concatenate([[-1], changes, [flat.size - 1]])
    counts = np.diff(boundaries)
    out = bytearray()
    for c in counts:
        c = int(c)
        if c < 255:
            out.append(c)
        elif c < 65536:
            out.append(255)
            out.append(c % 256)
            out.append(c // 256)
        else:
            out.append(0)
            out += int(c).to_bytes(8, "little")
    return bytes(out), bool(flat[0])


def _decompress_py(data: bytes, first_value: bool, n: int) -> np.ndarray:
    out = np.empty(n, dtype=bool)
    pos = 0
    written = 0
    value = first_value
    while written < n:
        head = data[pos]
        pos += 1
        if head == 255:
            count = data[pos] + 256 * data[pos + 1]
            pos += 2
        elif head == 0:
            count = int.from_bytes(data[pos : pos + 8], "little")
            pos += 8
        else:
            count = head
        out[written : written + count] = value
        written += count
        value = not value
    return out


class CompressedMask:
    """RLE bool mask with boxed access (``cpp/utils/compressed_mask.h``)."""

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self._first_value = False
        if _native is not None:
            self._data, self._first_value = _native.rle_compress(
                np.zeros(width * height, dtype=np.uint8)
            )
        else:
            self._data, self._first_value = _compress_py(
                np.zeros(width * height, dtype=bool)
            )

    def compressed_size(self) -> int:
        return len(self._data) + 1

    # -- full access -------------------------------------------------------
    def get(self) -> np.ndarray:
        n = self.width * self.height
        if _native is not None:
            flat = _native.rle_decompress(self._data, self._first_value, n)
        else:
            flat = _decompress_py(self._data, self._first_value, n)
        return flat.reshape(self.height, self.width)

    def set(self, mask: np.ndarray) -> None:
        assert mask.shape == (self.height, self.width)
        if _native is not None:
            self._data, self._first_value = _native.rle_compress(
                np.asarray(mask, dtype=np.uint8).reshape(-1)
            )
        else:
            self._data, self._first_value = _compress_py(mask)

    # -- boxed access ------------------------------------------------------
    def get_box(self, x: int, y: int, width: int, height: int) -> np.ndarray:
        """``CompressedMask::GetBox`` (``compressed_mask.cc:58-180``)."""
        return self.get()[y : y + height, x : x + width].copy()

    def set_box(
        self, box: np.ndarray, x: int, y: int, width: int, height: int
    ) -> None:
        full = self.get()
        full[y : y + height, x : x + width] = box
        self.set(full)
