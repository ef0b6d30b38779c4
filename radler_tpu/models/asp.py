"""Adaptive Scale Pixel (Bhatnagar & Cornwell 2004) — placeholder.

See ``cpp/algorithms/asp_algorithm.cc``; lands in the ASP milestone.
"""
from .base import DeconvolutionAlgorithm


class AspAlgorithm(DeconvolutionAlgorithm):
    def __init__(self, settings, beam_size, pixel_scale_x, pixel_scale_y):
        super().__init__()
        raise NotImplementedError("ASP is not implemented yet")
