"""Minimum-flux Dijkstra image splitter (host-side).

Behavioral equivalent of ``cpp/math/dijkstra_splitter.{h,cc}``: finds paths of
minimal summed |flux| through the image so facet boundaries avoid sources,
floods divider output into per-area masks, and computes bounding boxes with
even-size correction.

This is inherently sequential host-side work that runs once per major
iteration; a C++ implementation (``native/dijkstra.cc``) is loaded through
ctypes when built, with this NumPy/heapq version as the always-available
fallback.
"""

from __future__ import annotations

import heapq
from typing import Tuple

import numpy as np

try:  # optional native implementation
    from ..utils.native import dijkstra_native
except Exception:  # pragma: no cover
    dijkstra_native = None


class DijkstraSplitter:
    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height

    # -- path finding ------------------------------------------------------
    def divide_vertically(
        self, image: np.ndarray, output: np.ndarray, x1: int, x2: int
    ) -> None:
        """Find the minimum-|flux| top-to-bottom path within columns
        [x1, x2) and mark it with 1.0 in ``output``
        (``dijkstra_splitter.cc:34-86``)."""
        if dijkstra_native is not None:
            dijkstra_native.divide_vertically(
                image, output, self.width, self.height, x1, x2
            )
            return
        W, H = self.width, self.height
        dist = np.full((H, x2 - x1), np.inf, dtype=np.float64)
        prev = np.full((H, x2 - x1, 2), -1, dtype=np.int64)
        absimg = np.abs(image)
        heap = []
        for x in range(x1, x2):
            heapq.heappush(heap, (0.0, x, 0, x, 0))
        final_from = None
        while heap:
            d, x, y, fx, fy = heapq.heappop(heap)
            if y == H:
                final_from = (fx, fy)
                break
            nd = d + absimg[y, x]
            if nd < dist[y, x - x1]:
                dist[y, x - x1] = nd
                prev[y, x - x1] = (fx, fy)
                moves = [(x, y + 1)]
                if x > x1:
                    moves += [(x - 1, y + 1), (x - 1, y)]
                if x < x2 - 1:
                    moves += [(x + 1, y + 1), (x + 1, y)]
                for nx, ny in moves:
                    heapq.heappush(heap, (nd, nx, ny, x, y))
        output[:, x1:x2] = 0.0
        px, py = final_from
        while py > 0:
            output[py, px] = 1.0
            px, py = prev[py, px - x1]
        output[0, px] = 1.0

    def divide_horizontally(
        self, image: np.ndarray, output: np.ndarray, y1: int, y2: int
    ) -> None:
        """Transpose of :meth:`divide_vertically`
        (``dijkstra_splitter.cc:88-142``)."""
        sub = DijkstraSplitter(self.height, self.width)
        out_t = np.ascontiguousarray(output.T)
        sub.divide_vertically(np.ascontiguousarray(image.T), out_t, y1, y2)
        output[y1:y2, :] = out_t.T[y1:y2, :]

    # -- flooding ----------------------------------------------------------
    def flood_vertical_area(
        self, subdivision: np.ndarray, subimage_x: int
    ) -> Tuple[np.ndarray, int, int]:
        """Mask of the vertical area containing column ``subimage_x``,
        bounded by divider paths; the left divider is included in the area
        (``dijkstra_splitter.cc:144-180``).  Returns (mask, x, width)."""
        W, H = self.width, self.height
        mask = np.zeros((H, W), dtype=bool)
        x_min = W
        x2 = 0
        border = subdivision != 0.0
        for y in range(H):
            row = border[y]
            x_iter = subimage_x
            while x_iter >= 0 and not row[x_iter]:
                mask[y, x_iter] = True
                x_iter -= 1
            while x_iter >= 0 and row[x_iter]:
                mask[y, x_iter] = True
                x_iter -= 1
            x_min = min(x_min, x_iter + 1)
            x_iter = subimage_x + 1
            while x_iter < W and not row[x_iter]:
                mask[y, x_iter] = True
                x_iter += 1
            x2 = max(x2, x_iter)
        width = 0 if x2 < x_min else x2 - x_min
        return mask, x_min, width

    def flood_horizontal_area(
        self, subdivision: np.ndarray, subimage_y: int
    ) -> Tuple[np.ndarray, int, int]:
        """``dijkstra_splitter.cc:182-216``.  Returns (mask, y, height)."""
        sub = DijkstraSplitter(self.height, self.width)
        mask_t, y, height = sub.flood_vertical_area(
            np.ascontiguousarray(subdivision.T), subimage_y
        )
        return np.ascontiguousarray(mask_t.T), y, height

    # -- bounding ----------------------------------------------------------
    def get_bounding_mask(
        self,
        vertical_mask: np.ndarray,  # [H, v_width]
        vertical_mask_x: int,
        horizontal_mask: np.ndarray,  # [H, W]
    ) -> Tuple[np.ndarray, int, int, int, int]:
        """Intersection mask + bounding box, with even-size correction
        (``dijkstra_splitter.cc:218-285``).
        Returns (mask[H, W], sub_x, sub_y, subwidth, subheight)."""
        W, H = self.width, self.height
        v_width = vertical_mask.shape[1]
        mask = np.zeros((H, W), dtype=bool)
        region = np.zeros((H, W), dtype=bool)
        region[:, vertical_mask_x : vertical_mask_x + v_width] = vertical_mask
        mask[:, :] = region & horizontal_mask
        ys, xs = np.nonzero(mask)
        if len(xs) == 0:
            return mask, vertical_mask_x + v_width, H, 0, 0
        sub_x, sub_x2 = int(xs.min()), int(xs.max())
        sub_y, sub_y2 = int(ys.min()), int(ys.max())
        subwidth = sub_x2 + 1 - sub_x
        subheight = sub_y2 + 1 - sub_y
        # Keep facet sizes even when the full image is even
        # (dijkstra_splitter.cc:257-284).
        if W % 2 == 0 and subwidth % 2 != 0:
            subwidth += 1
            if subwidth + sub_x >= W:
                sub_x -= 1
                mask[sub_y : sub_y + subheight, sub_x] = False
            else:
                mask[sub_y : sub_y + subheight, sub_x + subwidth - 1] = False
        if H % 2 == 0 and subheight % 2 != 0:
            subheight += 1
            if subheight + sub_y >= H:
                sub_y -= 1
                mask[sub_y, sub_x : sub_x + subwidth] = False
            else:
                mask[sub_y + subheight - 1, sub_x : sub_x + subwidth] = False
        return mask, sub_x, sub_y, subwidth, subheight
