"""radler_tpu: a TPU-native radio-astronomical deconvolution framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of Radler (the
Radio Astronomical Deconvolution Library, reference at
``/root/reference``): Högbom/Clark CLEAN, multiscale CLEAN, IUWT
wavelet-sparsity deconvolution, ASP, joined-channel/polarization peak
finding, spectral fitting, auto-masking and faceted parallel deconvolution —
expressed as batched, jit-compiled matching-pursuit iterations over sharded
image cubes.

Public API mirrors the reference's Python bindings (``python/pyradler.cc``)::

    import radler_tpu as rd
    settings = rd.Settings()
    settings.algorithm_type = rd.AlgorithmType.GENERIC_CLEAN
    ...
    r = rd.Radler(settings, psf, residual, model, beam_size)
    another_needed = r.perform(0)
"""

from .settings import (
    AlgorithmType,
    LocalRmsMethod,
    MultiscaleShape,
    OptimizationAlgorithm,
    Polarization,
    Settings,
    SpectralFittingMode,
)
from .work_table import (
    ImageAccessor,
    LoadAndStoreImageAccessor,
    LoadOnlyImageAccessor,
    PsfOffset,
    WorkTable,
    WorkTableEntry,
)
from .component_list import ComponentList
from .image_set import ImageSet
from .radler import Radler
from . import checkpoint

__version__ = "0.1.0"

__all__ = [
    "AlgorithmType",
    "ComponentList",
    "ImageAccessor",
    "ImageSet",
    "LoadAndStoreImageAccessor",
    "LoadOnlyImageAccessor",
    "LocalRmsMethod",
    "MultiscaleShape",
    "OptimizationAlgorithm",
    "Polarization",
    "PsfOffset",
    "Radler",
    "Settings",
    "SpectralFittingMode",
    "WorkTable",
    "WorkTableEntry",
]
