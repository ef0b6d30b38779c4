"""Multiscale CLEAN (Offringa & Smirnov 2017) — placeholder.

The full TPU-native implementation (scale kernel bank, per-scale biased peak
search batched over scales, fixed-scale subminor loops, per-scale auto-masks)
lands in the multiscale milestone; see ``cpp/algorithms/multiscale_algorithm.cc``.
"""
from .base import DeconvolutionAlgorithm


class MultiScaleAlgorithm(DeconvolutionAlgorithm):
    def __init__(self, settings, beam_size, pixel_scale_x, pixel_scale_y,
                 track_components=False):
        super().__init__()
        raise NotImplementedError("Multiscale CLEAN is not implemented yet")
