"""Joined-channel / joined-polarization integration math tests.

Mirrors the behavioral spec of ``cpp/test/test_image_set.cc:98-622``:
normalization rules for XX, I, IQ, IQUV, XX_XY_YX_YY, squared-channel joins,
linked subsets, deconvolution-channel averaging including zero-weight NaN
channels, and PSF averaging.
"""

import numpy as np
import pytest

import radler_tpu as rd
from radler_tpu.image_set import ImageSet
from radler_tpu.work_table import (
    LoadAndStoreImageAccessor,
    LoadOnlyImageAccessor,
    WorkTable,
    WorkTableEntry,
)

P = rd.Polarization


def make_table(pol_per_channel, weights=None, n_deconv=0, images=None):
    n_chan = len(pol_per_channel)
    table = WorkTable([], n_chan, n_deconv)
    idx = 0
    for ch, pols in enumerate(pol_per_channel):
        for pi, pol in enumerate(pols):
            e = WorkTableEntry()
            e.polarization = pol
            e.original_channel_index = ch
            e.image_weight = 1.0 if weights is None else weights[ch]
            e.band_start_frequency = 100e6 + 10e6 * ch
            e.band_end_frequency = 110e6 + 10e6 * ch
            if images is not None:
                e.residual_accessor = LoadAndStoreImageAccessor(images[idx])
                e.model_accessor = LoadAndStoreImageAccessor(images[idx])
            if pi == 0:
                psf = np.zeros((4, 4), np.float32)
                e.psf_accessors = [LoadOnlyImageAccessor(psf)]
            table.add_entry(e)
            idx += 1
    return table


def make_set(pol_per_channel, data, squared=False, linked=set(), weights=None):
    n_images_expected = None
    table = make_table(pol_per_channel, weights)
    s = ImageSet.from_table(table, squared, linked, 4, 4)
    import jax.numpy as jnp

    s.data = jnp.asarray(np.asarray(data, np.float32).reshape(-1, 4, 4))
    return s


def uniform(value):
    return np.full((4, 4), value, np.float32)


class TestPolarizationNormalization:
    def test_single_stokes_i(self):
        s = make_set([[P.STOKES_I]], [uniform(3.0)])
        np.testing.assert_allclose(np.asarray(s.get_square_integrated()), 3.0)
        np.testing.assert_allclose(np.asarray(s.get_linear_integrated()), 3.0)

    def test_single_xx(self):
        s = make_set([[P.XX]], [uniform(-2.0)])
        # Single entry: returned directly, sign preserved.
        np.testing.assert_allclose(np.asarray(s.get_square_integrated()), -2.0)

    def test_dual_xx_yy(self):
        # sqrt((xx^2 + yy^2) * 0.5)
        s = make_set([[P.XX, P.YY]], [uniform(3.0), uniform(4.0)])
        expected = np.sqrt((9.0 + 16.0) * 0.5)
        np.testing.assert_allclose(
            np.asarray(s.get_square_integrated()), expected, rtol=1e-6
        )

    def test_iquv(self):
        s = make_set(
            [[P.STOKES_I, P.STOKES_Q, P.STOKES_U, P.STOKES_V]],
            [uniform(1.0), uniform(2.0), uniform(3.0), uniform(4.0)],
        )
        # Stokes including I: factor 1.0
        expected = np.sqrt(1.0 + 4.0 + 9.0 + 16.0)
        np.testing.assert_allclose(
            np.asarray(s.get_square_integrated()), expected, rtol=1e-6
        )

    def test_qu_without_i(self):
        s = make_set(
            [[P.STOKES_Q, P.STOKES_U]], [uniform(3.0), uniform(4.0)]
        )
        # all-Stokes-without-I: factor 1/n = 0.5
        expected = np.sqrt((9.0 + 16.0) * 0.5)
        np.testing.assert_allclose(
            np.asarray(s.get_square_integrated()), expected, rtol=1e-6
        )

    def test_full_linear(self):
        s = make_set(
            [[P.XX, P.XY, P.YX, P.YY]],
            [uniform(1.0), uniform(2.0), uniform(2.0), uniform(1.0)],
        )
        expected = np.sqrt((1.0 + 4.0 + 4.0 + 1.0) * 0.5)
        np.testing.assert_allclose(
            np.asarray(s.get_square_integrated()), expected, rtol=1e-6
        )

    def test_linked_subset(self):
        s = make_set(
            [[P.XX, P.YY]],
            [uniform(3.0), uniform(4.0)],
            linked={P.XX},
        )
        # Only XX participates; single linked pol of a dual set -> factor 1.0
        expected = np.sqrt(9.0)
        np.testing.assert_allclose(
            np.asarray(s.get_square_integrated()), expected, rtol=1e-6
        )


class TestChannelJoins:
    def test_two_channels_weighted(self):
        s = make_set(
            [[P.STOKES_I], [P.STOKES_I]],
            [uniform(2.0), uniform(4.0)],
            weights=[1.0, 3.0],
        )
        expected = (2.0 * 1.0 + 4.0 * 3.0) / 4.0
        np.testing.assert_allclose(
            np.asarray(s.get_square_integrated()), expected, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s.get_linear_integrated()), expected, rtol=1e-6
        )

    def test_squared_channels(self):
        s = make_set(
            [[P.STOKES_I], [P.STOKES_I]],
            [uniform(2.0), uniform(4.0)],
            squared=True,
            weights=[1.0, 1.0],
        )
        expected = np.sqrt((4.0 + 16.0) / 2.0)
        np.testing.assert_allclose(
            np.asarray(s.get_square_integrated()), expected, rtol=1e-6
        )

    def test_zero_weight_channel_ignored(self):
        img_nan = uniform(np.nan)
        s = make_set(
            [[P.STOKES_I], [P.STOKES_I]],
            [uniform(2.0), uniform(2.0)],
            weights=[1.0, 0.0],
        )
        # Zero-weight channel contributes nothing.
        np.testing.assert_allclose(
            np.asarray(s.get_square_integrated()), 2.0, rtol=1e-6
        )


class TestLoadAndAverage:
    def test_channel_averaging(self):
        images = [
            np.full((4, 4), 1.0, np.float32),
            np.full((4, 4), 3.0, np.float32),
            np.full((4, 4), 5.0, np.float32),
            np.full((4, 4), 7.0, np.float32),
        ]
        table = make_table(
            [[P.STOKES_I]] * 4, weights=[1.0, 1.0, 1.0, 1.0], n_deconv=2,
            images=images,
        )
        s = ImageSet.from_table(table, False, set(), 4, 4)
        s.load_and_average(True)
        assert s.meta.n_channels == 2
        host = np.asarray(s.data)
        np.testing.assert_allclose(host[0], 2.0, rtol=1e-6)
        np.testing.assert_allclose(host[1], 6.0, rtol=1e-6)

    def test_zero_weight_nan_excluded(self):
        images = [
            np.full((4, 4), np.nan, np.float32),
            np.full((4, 4), 3.0, np.float32),
        ]
        table = make_table(
            [[P.STOKES_I]] * 2, weights=[0.0, 1.0], n_deconv=1, images=images
        )
        s = ImageSet.from_table(table, False, set(), 4, 4)
        s.load_and_average(True)
        host = np.asarray(s.data)
        np.testing.assert_allclose(host[0], 3.0, rtol=1e-6)


class TestFrequencies:
    def test_deconvolution_frequencies(self):
        from radler_tpu.image_set import calculate_deconvolution_frequencies

        table = make_table(
            [[P.STOKES_I]] * 4, weights=[1.0, 1.0, 2.0, 0.0], n_deconv=2
        )
        freqs, weights = calculate_deconvolution_frequencies(table)
        # channels 0,1 -> group 0; channels 2,3 -> group 1
        np.testing.assert_allclose(freqs[0], 110e6)
        np.testing.assert_allclose(weights[0], 2.0)
        np.testing.assert_allclose(freqs[1], 125e6)  # weighted: only ch2
        np.testing.assert_allclose(weights[1], 2.0)
