"""WorkTable grouping and PSF validation tests.

Mirrors ``cpp/test/test_work_table.cc``: constructor clamping, original /
deconvolution grouping, and the ``ValidatePsfs`` failure modes
(``cpp/work_table.cc:46-99``).
"""

import numpy as np
import pytest

import radler_tpu as rd
from radler_tpu.work_table import (
    LoadOnlyImageAccessor,
    PsfOffset,
    WorkTable,
    WorkTableEntry,
)


def entry(channel=0, pol=rd.Polarization.STOKES_I, n_psfs=1, psf_shape=(4, 4)):
    e = WorkTableEntry()
    e.original_channel_index = channel
    e.polarization = pol
    e.image_weight = 1.0
    e.psf_accessors = [
        LoadOnlyImageAccessor(np.zeros(psf_shape, np.float32))
        for _ in range(n_psfs)
    ]
    return e


class TestConstruction:
    def test_zero_groups_clamped(self):
        table = WorkTable([], 0, 0)
        assert len(table.original_groups) == 1
        assert len(table.deconvolution_groups) == 1

    def test_deconvolution_group_mapping(self):
        table = WorkTable([], 6, 2)
        assert len(table.deconvolution_groups) == 2
        assert table.deconvolution_groups[0] == [0, 1, 2]
        assert table.deconvolution_groups[1] == [3, 4, 5]

    def test_deconvolution_groups_clamped_to_original(self):
        table = WorkTable([], 3, 7)
        assert len(table.deconvolution_groups) == 3

    def test_zero_deconvolution_groups(self):
        table = WorkTable([], 4, 0)
        assert len(table.deconvolution_groups) == 4

    def test_channel_index_offset(self):
        table = WorkTable([], 2, 1, channel_index_offset=4)
        assert table.channel_index_offset == 4

    def test_add_entry_grouping(self):
        table = WorkTable([], 2, 2)
        e0 = entry(0)
        e1 = entry(1, n_psfs=1)
        e2 = entry(0, pol=rd.Polarization.STOKES_Q, n_psfs=0)
        table.add_entry(e0)
        table.add_entry(e1)
        table.add_entry(e2)
        assert e0.index == 0 and e1.index == 1 and e2.index == 2
        assert table.original_groups[0] == [e0, e2]
        assert table.original_groups[1] == [e1]


class TestValidatePsfs:
    def test_valid(self):
        table = WorkTable([], 2, 2)
        table.add_entry(entry(0))
        table.add_entry(entry(1))
        table.add_entry(entry(0, pol=rd.Polarization.STOKES_Q, n_psfs=0))
        table.validate_psfs()

    def test_wrong_count_in_front(self):
        table = WorkTable([PsfOffset(0, 0), PsfOffset(1, 1)], 1, 1)
        table.add_entry(entry(0, n_psfs=1))
        with pytest.raises(RuntimeError, match="PSF accessors"):
            table.validate_psfs()

    def test_empty_psf_image(self):
        table = WorkTable([], 1, 1)
        e = entry(0, psf_shape=(0, 4))
        table.add_entry(e)
        with pytest.raises(RuntimeError, match="empty image"):
            table.validate_psfs()

    def test_mismatched_psf_sizes(self):
        table = WorkTable([], 2, 2)
        table.add_entry(entry(0, psf_shape=(4, 4)))
        table.add_entry(entry(1, psf_shape=(8, 8)))
        with pytest.raises(RuntimeError, match="different size"):
            table.validate_psfs()

    def test_secondary_entry_with_psfs(self):
        table = WorkTable([], 1, 1)
        table.add_entry(entry(0))
        table.add_entry(entry(0, pol=rd.Polarization.STOKES_Q, n_psfs=1))
        with pytest.raises(RuntimeError, match="first entry"):
            table.validate_psfs()


class TestCompressedMask:
    """Mirrors the compressed-mask roundtrip/box tests
    (``cpp/utils/test/``)."""

    def test_roundtrip(self):
        from radler_tpu.utils.compressed_mask import CompressedMask

        rng = np.random.default_rng(1)
        mask = rng.random((37, 53)) > 0.9
        cm = CompressedMask(53, 37)
        assert not cm.get().any()
        cm.set(mask)
        np.testing.assert_array_equal(cm.get(), mask)

    def test_boxes(self):
        from radler_tpu.utils.compressed_mask import CompressedMask

        cm = CompressedMask(64, 64)
        box = np.ones((8, 12), bool)
        cm.set_box(box, 5, 7, 12, 8)
        full = cm.get()
        assert full[7:15, 5:17].all()
        assert full.sum() == 8 * 12
        got = cm.get_box(5, 7, 12, 8)
        np.testing.assert_array_equal(got, box)

    def test_long_runs(self):
        from radler_tpu.utils.compressed_mask import CompressedMask

        n = 300
        mask = np.zeros((n, n), bool)
        mask[150, 200] = True  # forces a > 65536 run
        cm = CompressedMask(n, n)
        cm.set(mask)
        np.testing.assert_array_equal(cm.get(), mask)


class TestMesh:
    def test_sharded_clean_step(self):
        import jax
        from radler_tpu.parallel.mesh import dryrun_step

        if len(jax.devices()) < 4:
            pytest.skip("needs multiple virtual devices")
        peak = dryrun_step(8)
        assert np.isfinite(peak)
