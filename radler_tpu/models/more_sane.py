"""External MORESANE integration — placeholder.

See ``cpp/algorithms/more_sane.cc``; lands with the FITS shell-out milestone.
"""
from .base import DeconvolutionAlgorithm


class MoreSane(DeconvolutionAlgorithm):
    def __init__(self, settings, prefix_name):
        super().__init__()
        raise NotImplementedError("MoreSane shell-out is not implemented yet")
