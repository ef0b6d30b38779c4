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

import os as _os


def _enable_persistent_compilation_cache() -> None:
    """Wire up JAX's persistent compilation cache at import time.

    The hot paths are single large jitted programs (the fused multiscale
    minor loop, the Pallas Högbom/Clark loops); on a remote-compile backend a
    cold compile takes minutes and has been observed hanging when the compile
    service is degraded.  Caching compiled executables on disk makes every
    process after the first immune to that (the reference has no equivalent
    problem: FFTW wisdom plays the same role for it,
    ``cpp/radler.cc:114-117``).  Opt out with RADLER_TPU_NO_COMPILE_CACHE=1;
    override the location with RADLER_TPU_COMPILE_CACHE_DIR or JAX's own
    JAX_COMPILATION_CACHE_DIR.
    """
    if _os.environ.get("RADLER_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            # Per-user default: a world-shared /tmp path would collide
            # between users (permissions) and be a cache-poisoning surface
            # on shared hosts.
            default_dir = _os.environ.get(
                "RADLER_TPU_COMPILE_CACHE_DIR"
            ) or _os.path.join(
                _os.environ.get("XDG_CACHE_HOME")
                or _os.path.join(_os.path.expanduser("~"), ".cache"),
                "radler_tpu",
                "jax",
            )
            jax.config.update("jax_compilation_cache_dir", default_dir)
        # Lower the write threshold only if the application has not
        # configured it itself (JAX's default is 1.0 s).
        if jax.config.jax_persistent_cache_min_compile_time_secs == 1.0:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
    except Exception:
        pass


_enable_persistent_compilation_cache()

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
