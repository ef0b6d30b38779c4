"""IUWT wavelet-sparsity deconvolution — placeholder.

See ``cpp/algorithms/iuwt_deconvolution_algorithm.cc``; lands in the IUWT
milestone.
"""
from .base import DeconvolutionAlgorithm


class IuwtDeconvolution(DeconvolutionAlgorithm):
    def __init__(self):
        super().__init__()
        raise NotImplementedError("IUWT deconvolution is not implemented yet")
