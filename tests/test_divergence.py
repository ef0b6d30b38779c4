"""Faceted deconvolution with direction-dependent PSFs and divergence
rollback.

Mirrors ``cpp/test/test_divergence.cc``: a 5x5 sub-image grid with per-facet
DD PSFs, one of which is deliberately broken; the diverging facet must be
reset to its pre-iteration model while the other 24 deconvolve to threshold,
and the component list holds exactly 2 sources per healthy facet.
"""

import numpy as np
import pytest

import radler_tpu as rd
from radler_tpu.work_table import (
    LoadAndStoreImageAccessor,
    LoadOnlyImageAccessor,
    PsfOffset,
    WorkTable,
    WorkTableEntry,
)

GRID = 5
SUB_W = 32
SUB_H = 32
WIDTH = SUB_W * GRID
HEIGHT = SUB_H * GRID
PIXEL_SCALE = 1.0 / 60.0 / 60.0 * (np.pi / 180.0)


@pytest.mark.slow
def test_divergence():
    settings = rd.Settings()
    settings.trimmed_image_width = WIDTH
    settings.trimmed_image_height = HEIGHT
    settings.pixel_scale.x = PIXEL_SCALE
    settings.pixel_scale.y = PIXEL_SCALE
    settings.minor_iteration_count = 1_000_000
    settings.absolute_threshold = 1.0e-6
    settings.parallel.grid_width = GRID
    settings.parallel.grid_height = GRID
    settings.divergence_limit = 4.0
    settings.algorithm_type = rd.AlgorithmType.GENERIC_CLEAN
    settings.save_source_list = True

    good_psf = np.zeros((HEIGHT, WIDTH), np.float32)
    good_psf[HEIGHT // 2, WIDTH // 2] = 1.0
    bad_psf = np.zeros((HEIGHT, WIDTH), np.float32)
    # Off-centre peaks without a central peak cause divergence.
    bad_psf[HEIGHT // 2, WIDTH // 2 - 2] = 2.0
    bad_psf[HEIGHT // 2, WIDTH // 2 + 2] = 2.0

    residual = np.zeros((HEIGHT, WIDTH), np.float32)
    psf_offsets = []
    for gy in range(GRID):
        for gx in range(GRID):
            image_x = gx * SUB_W + SUB_W // 2
            image_y = gy * SUB_H + SUB_H // 2
            psf_offsets.append(PsfOffset(image_x, image_y))
            residual[image_y, image_x] = 5.0
            residual[image_y, image_x + 2] = 3.0
    model = np.zeros((HEIGHT, WIDTH), np.float32)

    table = WorkTable(psf_offsets, 1, 1)
    entry = WorkTableEntry()
    entry.polarization = rd.Polarization.STOKES_I
    entry.image_weight = 1.0
    entry.psf_accessors = [LoadOnlyImageAccessor(good_psf) for _ in range(25)]
    entry.psf_accessors[19] = LoadOnlyImageAccessor(bad_psf)  # facet [3, 4]
    entry.residual_accessor = LoadAndStoreImageAccessor(residual)
    entry.model_accessor = LoadAndStoreImageAccessor(model)
    table.add_entry(entry)

    radler = rd.Radler(settings, table, beam_size=PIXEL_SCALE)
    radler.perform(1)

    for gy in range(GRID):
        for gx in range(GRID):
            sub_image = gy * GRID + gx
            image_x = gx * SUB_W + SUB_W // 2
            image_y = gy * SUB_H + SUB_H // 2
            if sub_image == 19:
                assert abs(model[image_y, image_x]) <= 1.0e-5
                assert abs(model[image_y, image_x + 2]) <= 1.0e-5
            else:
                np.testing.assert_allclose(
                    model[image_y, image_x], 5.0, rtol=1e-3
                )
                np.testing.assert_allclose(
                    model[image_y, image_x + 2], 3.0, rtol=1e-3
                )
            block_model = model[
                gy * SUB_H : (gy + 1) * SUB_H, gx * SUB_W : (gx + 1) * SUB_W
            ]
            block_residual = residual[
                gy * SUB_H : (gy + 1) * SUB_H, gx * SUB_W : (gx + 1) * SUB_W
            ]
            assert np.isfinite(block_model).all()
            assert np.isfinite(block_residual).all()
            source_mask = np.zeros((SUB_H, SUB_W), bool)
            source_mask[SUB_H // 2, SUB_W // 2] = True
            source_mask[SUB_H // 2, SUB_W // 2 + 2] = True
            if sub_image != 19:
                assert (block_residual < 1.0e-5).all()
                assert (np.abs(block_model[~source_mask]) < 1.0e-5).all()
            else:
                assert (block_residual[~source_mask] < 1.0e-5).all()
                assert (np.abs(block_model) < 1.0e-5).all()

    component_list = radler.get_component_list()
    assert component_list.component_count(0) == GRID * GRID * 2 - 2
