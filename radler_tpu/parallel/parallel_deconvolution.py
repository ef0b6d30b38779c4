"""Facet (sub-image) orchestration layer.

Behavioral equivalent of ``cpp/algorithms/parallel_deconvolution.{h,cc}``.
The reference farms sub-images out to threads; here each facet's minor loop is
already a compiled device program, and the cross-facet exchanges (the global
start-peak max-reduce, the shared major-iteration threshold, the
boundary-masked merge, per-scale mask union) are the four collective patterns
described in SURVEY.md §2.2.  This module provides the host-side control; the
mesh-sharded execution path lives in :mod:`radler_tpu.parallel.faceting`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..settings import AlgorithmType, OptimizationAlgorithm, Settings
from ..component_list import ComponentList
from ..image_set import ImageSet
from ..models.base import DeconvolutionAlgorithm
from ..ops.convolution import untrim
from ..work_table import PsfOffset, WorkTable


def nearest_psf_index(psf_offsets: List[PsfOffset], x: int, y: int) -> int:
    """Nearest direction-dependent PSF to a position; first index wins ties
    (``parallel_deconvolution.cc:34-55``)."""
    if not psf_offsets:
        return 0
    best = 0
    best_d = None
    for i, off in enumerate(psf_offsets):
        d = (off.x - x) ** 2 + (off.y - y) ** 2
        if best_d is None or d < best_d:
            best_d = d
            best = i
    return best


@dataclasses.dataclass
class ParallelDeconvolutionResult:
    """``parallel_deconvolution.h``'s result struct."""

    another_iteration_required: bool = False
    start_peak: Optional[float] = None
    end_peak: Optional[float] = None


@dataclasses.dataclass
class SubImage:
    index: int = 0
    x: int = 0
    y: int = 0
    width: int = 0
    height: int = 0
    mask: Optional[np.ndarray] = None  # search mask (boundary ∧ user mask)
    boundary_mask: Optional[np.ndarray] = None  # ownership mask
    peak: float = 0.0
    reached_major_threshold: bool = False


class ParallelDeconvolution:
    """Host-side facet controller."""

    def __init__(self, settings: Settings):
        self.settings = settings
        self.algorithms: List[DeconvolutionAlgorithm] = []
        self._mask: Optional[np.ndarray] = None
        self._rms_image: Optional[jnp.ndarray] = None
        self._spectrally_forced_images: Optional[jnp.ndarray] = None
        self._track_per_scale_masks = False
        self._use_per_scale_masks = False
        self._scale_masks: List[np.ndarray] = []  # full-size per-scale masks
        self._component_list: Optional[ComponentList] = None
        # (box -> (source psf array, resized psf array)); see _run_sub_image.
        self._sub_psf_cache: dict = {}

    # -- setup ---------------------------------------------------------
    @property
    def is_initialized(self) -> bool:
        return bool(self.algorithms)

    def set_algorithm(self, algorithm: DeconvolutionAlgorithm) -> None:
        """One clone per facet (``parallel_deconvolution.cc:227-242``)."""
        n = self.settings.parallel.grid_width * self.settings.parallel.grid_height
        self.algorithms = [algorithm]
        for _ in range(1, n):
            self.algorithms.append(algorithm.clone())

    def free_algorithms(self) -> None:
        self.algorithms = []

    @property
    def first_algorithm(self) -> DeconvolutionAlgorithm:
        return self.algorithms[0]

    def max_scale_count_algorithm(self) -> DeconvolutionAlgorithm:
        """``parallel_deconvolution.cc:209-225``."""
        if self.settings.algorithm_type == AlgorithmType.MULTISCALE:
            return max(
                self.algorithms, key=lambda a: getattr(a, "scale_count", 0)
            )
        return self.first_algorithm

    def set_rms_factor_image(self, image: Optional[jnp.ndarray]) -> None:
        if len(self.algorithms) == 1:
            self.algorithms[0].rms_factor_image = image
        else:
            self._rms_image = image

    def set_threshold(self, threshold: float) -> None:
        for alg in self.algorithms:
            alg.threshold = threshold

    def set_minor_loop_gain(self, gain: float) -> None:
        for alg in self.algorithms:
            alg.minor_loop_gain = gain

    def set_auto_mask_mode(self, track: bool, use: bool) -> None:
        self._track_per_scale_masks = track
        self._use_per_scale_masks = use
        for alg in self.algorithms:
            alg.set_auto_mask_mode(track, use)

    def set_component_optimization(self, algorithm: OptimizationAlgorithm):
        for alg in self.algorithms:
            alg.component_optimization_algorithm = algorithm

    def set_clean_mask(self, mask: Optional[np.ndarray]) -> None:
        if len(self.algorithms) == 1:
            self.algorithms[0].clean_mask = mask
        else:
            self._mask = mask

    def set_spectrally_forced_images(self, images: jnp.ndarray) -> None:
        if len(self.algorithms) == 1:
            self.algorithms[0].set_spectrally_forced_images(images)
        else:
            self._spectrally_forced_images = images

    # -- component list -------------------------------------------------
    def get_component_list(self, table: WorkTable) -> ComponentList:
        """``parallel_deconvolution.cc:184-207``."""
        if self.settings.algorithm_type == AlgorithmType.MULTISCALE:
            if len(self.algorithms) == 1:
                comp_list = self.algorithms[0].get_component_list()
            else:
                comp_list = self._component_list
        else:
            w = self.settings.trimmed_image_width
            h = self.settings.trimmed_image_height
            model_set = ImageSet.from_table(
                table,
                self.settings.squared_joins,
                self.settings.linked_polarizations,
                w,
                h,
            )
            model_set.load_and_average(False)
            comp_list = ComponentList(w, h, image_set=model_set)
        comp_list.merge_duplicates()
        return comp_list

    # -- execution -------------------------------------------------------
    def execute_major_iteration(
        self,
        data_image: ImageSet,
        model_image: ImageSet,
        psf_images: List[jnp.ndarray],
        psf_offsets: List[PsfOffset],
        major_loop_gain: float,
    ) -> ParallelDeconvolutionResult:
        if len(self.algorithms) == 1:
            return self._execute_single_run(
                data_image, model_image, psf_images, psf_offsets, major_loop_gain
            )
        return self._execute_parallel_run(
            data_image, model_image, psf_images, psf_offsets, major_loop_gain
        )

    def _execute_single_run(
        self,
        data_image: ImageSet,
        model_image: ImageSet,
        psf_images: List[jnp.ndarray],
        psf_offsets: List[PsfOffset],
        major_loop_gain: float,
    ) -> ParallelDeconvolutionResult:
        """``parallel_deconvolution.cc:510-553``."""
        algorithm = self.algorithms[0]
        psf_index = nearest_psf_index(
            psf_offsets, model_image.width // 2, model_image.height // 2
        )
        psfs = psf_images[psf_index]  # [n_chan, h, w]
        if psfs.shape[-2:] != (data_image.height, data_image.width):
            psfs = untrim(psfs, data_image.height, data_image.width)
        algorithm.major_loop_gain = major_loop_gain
        result = algorithm.execute_major_iteration(data_image, model_image, psfs)
        return ParallelDeconvolutionResult(
            another_iteration_required=result.another_iteration_required,
            start_peak=result.starting_peak_value,
            end_peak=result.final_peak_value,
        )

    def _execute_parallel_run(
        self,
        data_image: ImageSet,
        model_image: ImageSet,
        psf_images: List[jnp.ndarray],
        psf_offsets: List[PsfOffset],
        major_loop_gain: float,
    ) -> ParallelDeconvolutionResult:
        """Faceted execution (``parallel_deconvolution.cc:555-654``):
        phase 1 finds every facet's peak (max-reduce), phase 2 cleans every
        facet to the shared threshold, with divergence rollback and
        boundary-masked merge."""
        from .faceting import make_sub_images

        width, height = data_image.width, data_image.height
        integrated = np.asarray(data_image.get_linear_integrated())
        sub_images = make_sub_images(
            integrated, self._mask, self.settings
        )
        psf_image_indices = [
            nearest_psf_index(
                psf_offsets, s.x + s.width // 2, s.y + s.height // 2
            )
            for s in sub_images
        ]

        if self._can_batch_facets(sub_images, psf_image_indices, data_image):
            return self._execute_batched_run(
                sub_images,
                data_image,
                model_image,
                psf_images,
                psf_image_indices,
                major_loop_gain,
            )

        result_model = model_image.clone_shape(width, height)

        # Phase 1: peak-only pass over all facets -> global start peak.
        for sub in sub_images:
            self._run_sub_image(
                sub,
                data_image,
                model_image,
                result_model,
                psf_images[psf_image_indices[sub.index]],
                0.0,
                find_peak_only=True,
            )
        start_peak_value = 0.0
        for sub in sub_images:
            if sub.peak > start_peak_value:
                start_peak_value = sub.peak
        m_iter_threshold = start_peak_value * (1.0 - major_loop_gain)

        # Phase 2: full deconvolution of each facet to the shared threshold.
        for sub in sub_images:
            self._run_sub_image(
                sub,
                data_image,
                model_image,
                result_model,
                psf_images[psf_image_indices[sub.index]],
                m_iter_threshold,
                find_peak_only=False,
            )
        model_image.data = result_model.data

        self._rms_image = None

        sub_images_finished = 0
        reached_max_n_iter = False
        for sub in sub_images:
            if not sub.reached_major_threshold:
                sub_images_finished += 1
            alg = self.algorithms[sub.index]
            if alg.iteration_number >= alg.max_iterations:
                reached_max_n_iter = True
        end_peak_value = max((s.peak for s in sub_images), default=0.0)
        result = ParallelDeconvolutionResult(
            start_peak=start_peak_value, end_peak=end_peak_value
        )
        result.another_iteration_required = sub_images_finished != len(
            sub_images
        )
        if result.another_iteration_required and reached_max_n_iter:
            result.another_iteration_required = False
        return result

    # -- batched facet execution ------------------------------------------
    def _can_batch_facets(
        self, sub_images: List[SubImage], psf_image_indices, data_image
    ) -> bool:
        """Whether all facets can run as one vmapped device program
        (``models/multiscale.py::execute_batched_facets``).  Falls back to
        the serial per-facet loop otherwise — identical semantics, one
        dispatch per facet."""
        import os

        if os.environ.get("RADLER_TPU_NO_BATCHED_FACETS"):
            return False
        if self.settings.algorithm_type not in (
            AlgorithmType.MULTISCALE,
            AlgorithmType.GENERIC_CLEAN,
        ):
            return False
        alg = self.algorithms[0]
        if not hasattr(alg, "batched_facets_eligible"):
            return False
        box_h = max(s.height for s in sub_images)
        box_w = max(s.width for s in sub_images)
        return alg.batched_facets_eligible(
            data_image.meta,
            box_w,
            box_h,
            len(sub_images),
            n_unique_psfs=len(set(psf_image_indices)),
        )

    def _execute_batched_run(
        self,
        sub_images: List[SubImage],
        data_image: ImageSet,
        model_image: ImageSet,
        psf_images: List[jnp.ndarray],
        psf_image_indices: List[int],
        major_loop_gain: float,
    ) -> ParallelDeconvolutionResult:
        """Both facet phases (``parallel_deconvolution.cc:582-617``) as one
        vmapped device program each: facets are padded to a common box, the
        peak-only pass and the clean pass run all facets in lockstep, and
        the boundary-masked merge/rollback happens on the stacked outputs.
        Direction-dependent PSFs become per-unique-PSF bank stacks gathered
        along the facet axis; per-scale auto-masks and component lists ride
        the fused loop's on-device accumulators and are merged/flushed here
        (the serial path's ``_load_scale_masks_into`` /
        ``_store_scale_masks_from`` / component aggregation,
        ``parallel_deconvolution.cc:359-390,425-479``)."""
        import numpy as _np

        alg = self.algorithms[0]
        width, height = data_image.width, data_image.height
        F = len(sub_images)
        N = data_image.n_images
        box_h = max(s.height for s in sub_images)
        box_w = max(s.width for s in sub_images)

        res_stack = jnp.zeros((F, N, box_h, box_w), jnp.float32)
        mdl_stack = jnp.zeros((F, N, box_h, box_w), jnp.float32)
        masks = _np.zeros((F, box_h, box_w), dtype=bool)
        boxes = []
        for f, sub in enumerate(sub_images):
            sh, sw = sub.height, sub.width
            res_stack = res_stack.at[f, :, :sh, :sw].set(
                data_image.data[:, sub.y : sub.y + sh, sub.x : sub.x + sw]
            )
            # Zero the model outside the boundary so shared sources are not
            # added by multiple facets (parallel_deconvolution.cc:308-313).
            bmask = jnp.asarray(sub.boundary_mask)
            mdl_stack = mdl_stack.at[f, :, :sh, :sw].set(
                jnp.where(
                    bmask[None],
                    model_image.data[
                        :, sub.y : sub.y + sh, sub.x : sub.x + sw
                    ],
                    0.0,
                )
            )
            masks[f, :sh, :sw] = sub.mask
            boxes.append((sw, sh))
        initial_models = mdl_stack

        if self._rms_image is not None:
            rms_stack = jnp.zeros((F, box_h, box_w), jnp.float32)
            for f, sub in enumerate(sub_images):
                rms_stack = rms_stack.at[
                    f, : sub.height, : sub.width
                ].set(
                    self._rms_image[
                        sub.y : sub.y + sub.height, sub.x : sub.x + sub.width
                    ]
                )
        else:
            rms_stack = None

        def fit_to_box(p):
            if p.shape[-2:] == (box_h, box_w):
                return p
            from ..ops.convolution import trim as trim_op

            ph, pw = p.shape[-2:]
            if ph >= box_h and pw >= box_w:
                return trim_op(p, box_h, box_w)
            return untrim(p, box_h, box_w)

        unique_indices = sorted(set(psf_image_indices))
        if len(unique_indices) == 1:
            psfs = fit_to_box(psf_images[unique_indices[0]])
            facet_psf_slot = None
        else:
            # Direction-dependent PSFs: stack the unique PSFs on a leading
            # axis; each facet selects its bank by slot.
            slot_of = {u: i for i, u in enumerate(unique_indices)}
            psfs = jnp.stack(
                [fit_to_box(psf_images[u]) for u in unique_indices]
            )
            facet_psf_slot = [slot_of[i] for i in psf_image_indices]

        # Per-facet per-scale mask boxes (phase-1 starting state / phase-2
        # search restriction), as the serial path loads per clone.
        track_masks = self._track_per_scale_masks
        use_masks = self._use_per_scale_masks
        facet_scale_masks = None
        n_scales = getattr(alg, "scale_count", 0)
        if (track_masks or use_masks) and self._scale_masks:
            facet_scale_masks = _np.zeros(
                (F, max(n_scales, len(self._scale_masks)), box_h, box_w),
                dtype=bool,
            )
            for f, sub in enumerate(sub_images):
                for i, full in enumerate(self._scale_masks):
                    facet_scale_masks[f, i, : sub.height, : sub.width] = (
                        full[
                            sub.y : sub.y + sub.height,
                            sub.x : sub.x + sub.width,
                        ]
                        & sub.mask
                    )

        starts = _np.asarray(
            [self.algorithms[s.index].iteration_number for s in sub_images],
            dtype=_np.int32,
        )

        # FORCED-mode spectral fitting: each facet's slice of the global
        # term images rides the batched program (the serial path's
        # set_spectrally_forced_images per clone).
        facet_forced_terms = None
        if self._spectrally_forced_images is not None:
            T1 = self._spectrally_forced_images.shape[0]
            forced = _np.zeros((F, T1, box_h, box_w), _np.float32)
            forced_np = _np.asarray(self._spectrally_forced_images)
            for f, sub in enumerate(sub_images):
                forced[f, :, : sub.height, : sub.width] = forced_np[
                    :, sub.y : sub.y + sub.height, sub.x : sub.x + sub.width
                ]
            facet_forced_terms = forced

        # Phase 1: peak-only pass (max-reduce over facets).
        _, _, peak_results, _, _, _ = alg.execute_batched_facets(
            res_stack,
            mdl_stack,
            psfs,
            boxes,
            masks,
            rms_stack,
            0.0,
            starts,
            True,
            data_image.meta,
            facet_psf_slot=facet_psf_slot,
            facet_scale_masks=facet_scale_masks,
            facet_forced_terms=facet_forced_terms,
        )
        start_peak_value = 0.0
        for f, sub in enumerate(sub_images):
            sub.peak = peak_results[f].final_peak_value
            if sub.peak > start_peak_value:
                start_peak_value = sub.peak
        peaks_at_start = [abs(s.peak) for s in sub_images]
        m_iter_threshold = start_peak_value * (1.0 - major_loop_gain)

        # Phase 2: clean every facet to the shared threshold.
        new_res, new_mdl, results, iters, mask_acc, comp_acc = (
            alg.execute_batched_facets(
                res_stack,
                mdl_stack,
                psfs,
                boxes,
                masks,
                rms_stack,
                m_iter_threshold,
                starts,
                False,
                data_image.meta,
                facet_psf_slot=facet_psf_slot,
                facet_scale_masks=facet_scale_masks,
                facet_forced_terms=facet_forced_terms,
            )
        )

        result_model = model_image.clone_shape(width, height)
        data = data_image.data
        model_acc = result_model.data
        save_components = (
            self.settings.save_source_list
            and self.settings.algorithm_type == AlgorithmType.MULTISCALE
        )
        mask_acc_h = _np.asarray(mask_acc) if track_masks else None
        comp_acc_h = _np.asarray(comp_acc) if save_components else None
        if track_masks and not self._scale_masks:
            self._scale_masks = [
                _np.zeros((height, width), dtype=bool)
                for _ in range(n_scales)
            ]
        if save_components and self._component_list is None:
            self._component_list = ComponentList(
                width, height, n_scales, N
            )
        for f, sub in enumerate(sub_images):
            r = results[f]
            sub.peak = r.final_peak_value
            sub.reached_major_threshold = r.another_iteration_required
            self.algorithms[sub.index].iteration_number = int(iters[f])
            converging = (
                (
                    self.settings.divergence_limit == 0.0
                    or abs(sub.peak)
                    <= peaks_at_start[f] * self.settings.divergence_limit
                )
                and math.isfinite(sub.peak)
                and not r.is_diverging
            )
            if not converging:
                sub.reached_major_threshold = False
            sh, sw = sub.height, sub.width
            bmask = jnp.asarray(sub.boundary_mask)
            if converging:
                data = data.at[
                    :, sub.y : sub.y + sh, sub.x : sub.x + sw
                ].set(
                    jnp.where(
                        bmask[None],
                        new_res[f, :, :sh, :sw],
                        data[:, sub.y : sub.y + sh, sub.x : sub.x + sw],
                    )
                )
                facet_model = new_mdl[f, :, :sh, :sw]
                if track_masks:
                    # Boundary-merged per-scale mask union, as the serial
                    # path's _store_scale_masks_from.
                    for i in range(min(n_scales, mask_acc_h.shape[1])):
                        local = mask_acc_h[f, i, :sh, :sw]
                        if facet_scale_masks is not None:
                            local = local | facet_scale_masks[f, i, :sh, :sw]
                        box = self._scale_masks[i][
                            sub.y : sub.y + sh, sub.x : sub.x + sw
                        ]
                        self._scale_masks[i][
                            sub.y : sub.y + sh, sub.x : sub.x + sw
                        ] = _np.where(sub.boundary_mask, local, box)
                if save_components:
                    for i in range(min(n_scales, comp_acc_h.shape[1])):
                        comp = comp_acc_h[f, i, :, :sh, :sw]
                        ys, xs = _np.nonzero(_np.any(comp != 0.0, axis=0))
                        for j in range(xs.size):
                            self._component_list.add(
                                int(xs[j]) + sub.x,
                                int(ys[j]) + sub.y,
                                i,
                                comp[:, ys[j], xs[j]],
                            )
            else:
                # Rollback: keep the pre-iteration model for this facet
                # (parallel_deconvolution.cc:398-419).
                facet_model = initial_models[f, :, :sh, :sw]
            model_acc = model_acc.at[
                :, sub.y : sub.y + sh, sub.x : sub.x + sw
            ].add(facet_model)
        data_image.data = data
        result_model.data = model_acc
        model_image.data = result_model.data

        self._rms_image = None

        sub_images_finished = 0
        reached_max_n_iter = False
        for sub in sub_images:
            if not sub.reached_major_threshold:
                sub_images_finished += 1
            a = self.algorithms[sub.index]
            if a.iteration_number >= a.max_iterations:
                reached_max_n_iter = True
        end_peak_value = max((s.peak for s in sub_images), default=0.0)
        result = ParallelDeconvolutionResult(
            start_peak=start_peak_value, end_peak=end_peak_value
        )
        result.another_iteration_required = sub_images_finished != len(
            sub_images
        )
        if result.another_iteration_required and reached_max_n_iter:
            result.another_iteration_required = False
        return result

    def _run_sub_image(
        self,
        sub: SubImage,
        data_image: ImageSet,
        model_image: ImageSet,
        result_model: ImageSet,
        psfs: jnp.ndarray,
        major_iteration_threshold: float,
        find_peak_only: bool,
    ) -> None:
        """``parallel_deconvolution.cc:294-495``."""
        algorithm = self.algorithms[sub.index]
        sub_data = data_image.trim(
            sub.x, sub.y, sub.x + sub.width, sub.y + sub.height
        )
        # Zero the model outside the boundary so shared sources are not added
        # by multiple facets (see comment at parallel_deconvolution.cc:308-313).
        sub_model = model_image.trim_masked(
            sub.x, sub.y, sub.x + sub.width, sub.y + sub.height, sub.boundary_mask
        )
        initial_model_data = sub_model.data

        # PSFs resized to the facet size (coarser or finer DD grids).
        # Cached per (source array, box): serial facets share one resized
        # PSF array, which also lets the fused-bank cache (multiscale.py::
        # _prepare_fused_banks) hit across facet clones instead of
        # rebuilding ~GBs of per-scale banks per facet.
        if psfs.shape[-2:] != (sub.height, sub.width):
            cache_key = (sub.height, sub.width)
            cached = self._sub_psf_cache.get(cache_key)
            if cached is not None and cached[0] is psfs:
                sub_psfs = cached[1]
            else:
                from ..ops.convolution import trim as trim_op

                ph, pw = psfs.shape[-2:]
                if ph >= sub.height and pw >= sub.width:
                    sub_psfs = trim_op(psfs, sub.height, sub.width)
                else:
                    sub_psfs = untrim(psfs, sub.height, sub.width)
                if len(self._sub_psf_cache) > 8:
                    self._sub_psf_cache.clear()
                self._sub_psf_cache[cache_key] = (psfs, sub_psfs)
        else:
            sub_psfs = psfs

        algorithm.clean_mask = sub.mask
        if self._rms_image is not None:
            algorithm.rms_factor_image = self._rms_image[
                sub.y : sub.y + sub.height, sub.x : sub.x + sub.width
            ]
        if self._spectrally_forced_images is not None:
            algorithm.set_spectrally_forced_images(
                self._spectrally_forced_images[
                    :, sub.y : sub.y + sub.height, sub.x : sub.x + sub.width
                ]
            )

        max_n_iter = algorithm.max_iterations
        if find_peak_only:
            algorithm.max_iterations = 0
        else:
            algorithm.major_iteration_threshold = major_iteration_threshold

        if self._use_per_scale_masks or self._track_per_scale_masks:
            self._load_scale_masks_into(algorithm, sub)

        peak_at_start = abs(sub.peak)
        result = algorithm.execute_major_iteration(sub_data, sub_model, sub_psfs)
        sub.peak = result.final_peak_value
        sub.reached_major_threshold = result.another_iteration_required

        converging = (
            (
                self.settings.divergence_limit == 0.0
                or abs(sub.peak)
                <= peak_at_start * self.settings.divergence_limit
            )
            and math.isfinite(sub.peak)
            and not result.is_diverging
        )
        if not converging and not find_peak_only:
            sub.reached_major_threshold = False

        algorithm.rms_factor_image = None

        if self._track_per_scale_masks and converging and not find_peak_only:
            self._store_scale_masks_from(algorithm, sub)

        if (
            self.settings.save_source_list
            and self.settings.algorithm_type == AlgorithmType.MULTISCALE
        ):
            if converging:
                if self._component_list is None:
                    self._component_list = ComponentList(
                        data_image.width,
                        data_image.height,
                        algorithm.scale_count,
                        data_image.n_images,
                    )
                self._component_list.add_list(
                    algorithm.get_component_list(), sub.x, sub.y
                )
            algorithm.clear_component_list()

        if find_peak_only:
            algorithm.max_iterations = max_n_iter
        else:
            if converging:
                data_image.copy_masked(sub_data, sub.x, sub.y, sub.boundary_mask)
            else:
                # Rollback: keep the pre-iteration model for this facet.
                sub_model.data = initial_model_data
            result_model.add_sub_image(sub_model, sub.x, sub.y)

    # -- per-scale mask plumbing (multiscale + faceting) ----------------
    def _load_scale_masks_into(self, algorithm, sub: SubImage) -> None:
        """``parallel_deconvolution.cc:359-390``."""
        if not self._scale_masks:
            return
        algorithm.set_scale_mask_count(
            max(algorithm.get_scale_mask_count(), len(self._scale_masks))
        )
        for i in range(algorithm.get_scale_mask_count()):
            if i < len(self._scale_masks):
                box = self._scale_masks[i][
                    sub.y : sub.y + sub.height, sub.x : sub.x + sub.width
                ]
                algorithm.set_scale_mask(i, box & sub.mask)
            else:
                algorithm.set_scale_mask(
                    i, np.zeros((sub.height, sub.width), dtype=bool)
                )

    def _store_scale_masks_from(self, algorithm, sub: SubImage) -> None:
        """``parallel_deconvolution.cc:425-463``."""
        n_scales = algorithm.scale_count
        if not self._scale_masks:
            h = self.settings.trimmed_image_height
            w = self.settings.trimmed_image_width
            self._scale_masks = [
                np.zeros((h, w), dtype=bool) for _ in range(n_scales)
            ]
        for scale_index in range(n_scales):
            if scale_index < len(self._scale_masks):
                ms_mask = algorithm.get_scale_mask(scale_index)
                box = self._scale_masks[scale_index][
                    sub.y : sub.y + sub.height, sub.x : sub.x + sub.width
                ]
                merged = np.where(sub.boundary_mask, ms_mask, box)
                self._scale_masks[scale_index][
                    sub.y : sub.y + sub.height, sub.x : sub.x + sub.width
                ] = merged
