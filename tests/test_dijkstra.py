"""Dijkstra splitter tests (mirrors ``cpp/math/test/test_dijkstra_splitter.cc``
scenarios: min-flux paths on synthetic patterns, flooding, bounding masks)."""

import numpy as np
import pytest

from radler_tpu.parallel.dijkstra import DijkstraSplitter
from radler_tpu.parallel.faceting import make_sub_images
import radler_tpu as rd


class TestDividers:
    def test_vertical_path_avoids_flux(self):
        w = h = 40
        img = np.zeros((h, w), np.float32)
        img[:, 18:22] = 10.0  # expensive column band
        img[:, 24] = 0.0  # free corridor at x=24
        out = np.zeros((h, w), np.float32)
        DijkstraSplitter(w, h).divide_vertically(img, out, 12, 28)
        xs = np.nonzero(out)[1]
        assert (out.sum(axis=1) >= 1).all()  # one path pixel per row
        assert not set(range(18, 22)) & set(xs.tolist())

    def test_vertical_path_on_zero_image_stays_connected(self):
        w = h = 32
        img = np.zeros((h, w), np.float32)
        out = np.zeros((h, w), np.float32)
        DijkstraSplitter(w, h).divide_vertically(img, out, 8, 24)
        ys, xs = np.nonzero(out)
        assert set(ys.tolist()) == set(range(h))
        # Path is 5-connected: consecutive rows differ by at most 1 column.
        order = np.argsort(ys)
        diffs = np.abs(np.diff(xs[order]))
        assert (diffs <= 1).all()

    def test_horizontal_path(self):
        w = h = 32
        img = np.zeros((h, w), np.float32)
        img[14:18, :] = 5.0
        img[20, :] = 0.0
        out = np.zeros((h, w), np.float32)
        DijkstraSplitter(w, h).divide_horizontally(img, out, 10, 26)
        ys = np.nonzero(out)[0]
        assert not set(range(14, 18)) & set(ys.tolist())


class TestFloodAndBounding:
    def test_flood_vertical_area(self):
        w = h = 32
        division = np.zeros((h, w), np.float32)
        division[:, 16] = 1.0
        splitter = DijkstraSplitter(w, h)
        mask_l, x_l, w_l = splitter.flood_vertical_area(division, 8)
        # The divider column belongs to the area on its right: flooding
        # passes through the border only when moving left
        # (dijkstra_splitter.cc:160-165).
        assert x_l == 0 and w_l == 16
        mask_r, x_r, w_r = splitter.flood_vertical_area(division, 24)
        assert x_r == 16 and x_r + w_r == w

    def test_make_sub_images_partition(self):
        """Every pixel is owned by exactly one facet boundary mask."""
        w = h = 64
        rng = np.random.default_rng(0)
        img = (rng.random((h, w)) * 0.01).astype(np.float32)
        img[20, 20] = 5.0
        img[40, 50] = 3.0
        settings = rd.Settings()
        settings.parallel.grid_width = 2
        settings.parallel.grid_height = 2
        subs = make_sub_images(img, None, settings)
        assert len(subs) == 4
        coverage = np.zeros((h, w), np.int32)
        for s in subs:
            coverage[s.y : s.y + s.height, s.x : s.x + s.width] += (
                s.boundary_mask.astype(np.int32)
            )
        assert (coverage == 1).all()

    def test_even_size_correction(self):
        """Facet boxes stay even-sized when the image is even
        (dijkstra_splitter.cc:257-284)."""
        w = h = 64
        img = np.zeros((h, w), np.float32)
        settings = rd.Settings()
        settings.parallel.grid_width = 3
        settings.parallel.grid_height = 3
        subs = make_sub_images(img, None, settings)
        for s in subs:
            assert s.width % 2 == 0
            assert s.height % 2 == 0
