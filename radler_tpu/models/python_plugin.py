"""User-supplied Python deconvolution algorithm — placeholder.

See ``cpp/algorithms/python_deconvolution.cc``; lands with the plugin
milestone (no embedded interpreter needed here — we *are* Python).
"""
from .base import DeconvolutionAlgorithm


class PythonDeconvolution(DeconvolutionAlgorithm):
    def __init__(self, filename):
        super().__init__()
        raise NotImplementedError("Python plugin algorithm is not implemented yet")
