"""Facet decomposition of the image into sub-images.

Equivalent of ``MakeSubImages`` in
``cpp/algorithms/parallel_deconvolution.cc:69-168``: the image is split into
a ``grid_width x grid_height`` grid whose boundaries follow minimum-|flux|
Dijkstra paths, each facet gets a *boundary (ownership) mask* guaranteeing
every pixel is cleaned by exactly one facet, and a search mask that also
honors the user's clean mask.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..settings import Settings
from .dijkstra import DijkstraSplitter
from .parallel_deconvolution import SubImage


def make_sub_images(
    image: np.ndarray,
    mask: Optional[np.ndarray],
    settings: Settings,
) -> List[SubImage]:
    height, width = image.shape
    grid_w = settings.parallel.grid_width
    grid_h = settings.parallel.grid_height
    avg_h_size = width // grid_w
    avg_v_size = height // grid_h

    splitter = DijkstraSplitter(width, height)
    dividing_line = np.zeros((height, width), dtype=np.float32)

    # Vertical dividers -> vertical areas.
    for div_nr in range(1, grid_w):
        split_middle = width * div_nr // grid_w
        splitter.divide_vertically(
            image,
            dividing_line,
            split_middle - avg_h_size // 4,
            split_middle + avg_h_size // 4,
        )
    vertical_areas = []
    for div_nr in range(grid_w):
        mid_x = div_nr * width // grid_w + avg_h_size // 2
        vmask, vx, vwidth = splitter.flood_vertical_area(dividing_line, mid_x)
        vertical_areas.append((vmask[:, vx : vx + vwidth], vx, vwidth))

    # Horizontal dividers.
    dividing_line[:] = 0.0
    for div_nr in range(1, grid_h):
        split_middle = height * div_nr // grid_h
        splitter.divide_horizontally(
            image,
            dividing_line,
            split_middle - avg_v_size // 4,
            split_middle + avg_v_size // 4,
        )

    sub_images: List[SubImage] = []
    for gy in range(grid_h):
        mid_y = gy * height // grid_h + avg_v_size // 2
        hmask, _, _ = splitter.flood_horizontal_area(dividing_line, mid_y)
        for gx in range(grid_w):
            vmask, vx, vwidth = vertical_areas[gx]
            bounding_mask, sx, sy, sw, sh = splitter.get_bounding_mask(
                vmask, vx, hmask
            )
            sub = SubImage(
                index=len(sub_images), x=sx, y=sy, width=sw, height=sh
            )
            sub.boundary_mask = bounding_mask[sy : sy + sh, sx : sx + sw].copy()
            if mask is not None:
                sub.mask = sub.boundary_mask & mask[sy : sy + sh, sx : sx + sw]
            else:
                sub.mask = sub.boundary_mask.copy()
            sub_images.append(sub)
    return sub_images
