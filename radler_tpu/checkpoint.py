"""Checkpoint / resume of the major-loop state.

The reference keeps no checkpointing (SURVEY.md §5): resumability lives in
the caller's major loop, with implicit algorithm state (iteration number,
auto-mask phase, per-scale masks, component lists) held in memory.  This
module makes exactly that state an explicit, serializable structure so a
major loop can resume after preemption — the missing aux subsystem called
out in the survey.

Format: a single ``.npz`` with a JSON header plus the bool/float arrays.
The caller still owns the residual/model images themselves (they round-trip
through the accessors each major iteration).
"""

from __future__ import annotations

import json
import numpy as np

_FORMAT_VERSION = 1


def save_state(radler, path: str) -> None:
    """Serialize the cross-major-iteration state of a :class:`Radler`."""
    from .models.multiscale import MultiScaleAlgorithm

    arrays = {}
    header = {
        "version": _FORMAT_VERSION,
        "auto_mask_is_finished": radler._auto_mask_is_finished,
        "auto_mask_finishing_iteration": radler._auto_mask_finishing_iteration,
        "algorithms": [],
    }
    if radler._auto_mask is not None:
        arrays["auto_mask"] = radler._auto_mask
    for i, alg in enumerate(radler._parallel.algorithms):
        alg_state = {"iteration_number": alg.iteration_number}
        if isinstance(alg, MultiScaleAlgorithm):
            alg_state["scales"] = [
                {
                    "scale": s.scale,
                    "kernel_peak": s.kernel_peak,
                    "psf_peak": s.psf_peak,
                    "bias_factor": s.bias_factor,
                    "gain": s.gain,
                    "is_active": s.is_active,
                    "n_components_cleaned": s.n_components_cleaned,
                    "total_flux_cleaned": s.total_flux_cleaned,
                }
                for s in alg.scale_infos
            ]
            for j, mask in enumerate(alg.scale_masks):
                if mask is not None:
                    arrays[f"alg{i}_scale_mask{j}"] = mask
            alg_state["n_scale_masks"] = len(alg.scale_masks)
        header["algorithms"].append(alg_state)
    # Facet-level per-scale masks (ParallelDeconvolution._scale_masks).
    for j, mask in enumerate(radler._parallel._scale_masks):
        arrays[f"facet_scale_mask{j}"] = mask
    header["n_facet_scale_masks"] = len(radler._parallel._scale_masks)

    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_state(radler, path: str) -> None:
    """Restore state saved with :func:`save_state` into a freshly
    constructed :class:`Radler` with the same settings/work table."""
    from .models.multiscale import MultiScaleAlgorithm, ScaleInfo

    with np.load(path) as data:
        header = json.loads(bytes(data["__header__"].tobytes()).decode())
        if header["version"] != _FORMAT_VERSION:
            raise RuntimeError(
                f"Unsupported checkpoint version {header['version']}"
            )
        radler._auto_mask_is_finished = header["auto_mask_is_finished"]
        radler._auto_mask_finishing_iteration = header[
            "auto_mask_finishing_iteration"
        ]
        radler._auto_mask = (
            data["auto_mask"] if "auto_mask" in data else None
        )
        algorithms = radler._parallel.algorithms
        if len(algorithms) != len(header["algorithms"]):
            raise RuntimeError(
                "Checkpoint algorithm count does not match the current "
                "configuration"
            )
        for i, (alg, alg_state) in enumerate(
            zip(algorithms, header["algorithms"])
        ):
            alg.iteration_number = alg_state["iteration_number"]
            if isinstance(alg, MultiScaleAlgorithm) and "scales" in alg_state:
                alg.scale_infos = []
                for s in alg_state["scales"]:
                    info = ScaleInfo()
                    for key, value in s.items():
                        setattr(info, key, value)
                    alg.scale_infos.append(info)
                alg.scale_masks = []
                for j in range(alg_state.get("n_scale_masks", 0)):
                    key = f"alg{i}_scale_mask{j}"
                    alg.scale_masks.append(
                        data[key] if key in data else None
                    )
        radler._parallel._scale_masks = [
            data[f"facet_scale_mask{j}"]
            for j in range(header.get("n_facet_scale_masks", 0))
        ]
