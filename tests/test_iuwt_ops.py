"""Unit tests for the fused IUWT op helpers (ops/iuwt.py).

Each helper bundles formerly-eager host glue into one dispatch; these tests
pin their semantics against straightforward NumPy/JAX reference
implementations (reference behavior: ``cpp/algorithms/iuwt/*`` and
``iuwt_deconvolution_algorithm.cc``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radler_tpu.ops import iuwt as iuwt_ops


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(42)
    H = W = 64
    img = rng.normal(scale=0.1, size=(H, W)).astype(np.float32)
    img[20, 30] += 3.0
    img[40, 44] -= 2.0
    return jnp.asarray(img)


def test_structure_stats_matches_parts(field):
    H, W = field.shape
    n_scales = 3
    window = np.zeros((H, W), bool)
    window[4:-4, 4:-4] = True
    coeffs, stats = iuwt_ops.structure_stats(
        field, jnp.asarray(window), n_scales, True
    )
    # Coefficients match a plain decomposition (fusion inside the combined
    # program changes rounding slightly, hence the atol).
    ref_coeffs = iuwt_ops.decompose(field, n_scales)
    np.testing.assert_allclose(
        np.asarray(coeffs), np.asarray(ref_coeffs), rtol=1e-5, atol=1e-6
    )
    stats = np.asarray(stats)
    assert stats.shape == (5, n_scales)
    c = np.asarray(ref_coeffs)[:n_scales]
    for s in range(n_scales):
        masked = np.where(window, np.abs(c[s]), -np.inf)
        idx = masked.argmax()
        y, x = divmod(idx, W)
        assert stats[1][s] == pytest.approx(np.abs(c[s][y, x]), rel=1e-6)
        assert int(stats[2][s]) == x and int(stats[3][s]) == y
        # Row 4 is the SIGNED value at the peak.
        assert stats[4][s] == pytest.approx(c[s][y, x], rel=1e-6)


def test_psf_response_stats(field):
    H, W = field.shape
    psf = np.zeros((H, W), np.float32)
    psf[H // 2, W // 2] = 1.0
    psf[H // 2 - 1 : H // 2 + 2, W // 2] += 0.3
    n_scales = 3
    stats = np.asarray(iuwt_ops.psf_response_stats(jnp.asarray(psf), n_scales))
    scales = np.asarray(iuwt_ops.decompose(jnp.asarray(psf), n_scales))
    np.testing.assert_allclose(
        stats[0],
        np.sqrt(np.mean(scales[:n_scales] ** 2, axis=(1, 2))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        stats[1], scales[:n_scales, H // 2, W // 2], rtol=1e-5
    )
    next_scales = np.asarray(
        iuwt_ops.decompose(jnp.asarray(scales[1]), n_scales)
    )
    np.testing.assert_allclose(
        stats[2], next_scales[:n_scales, H // 2, W // 2], rtol=1e-5
    )


def test_masked_recompose_bbox(field):
    n_scales = 2
    coeffs = iuwt_ops.decompose(field, n_scales)
    H, W = field.shape
    mask = np.zeros((n_scales, H, W), bool)
    mask[:, 18:23, 28:33] = True
    box = np.asarray(
        iuwt_ops.masked_recompose_bbox(coeffs, jnp.asarray(mask), n_scales)
    )
    rec = iuwt_ops.recompose(
        iuwt_ops.apply_mask(coeffs, jnp.asarray(mask)), n_scales, False
    )
    ref_box = np.asarray(iuwt_ops.bounding_box(rec))
    np.testing.assert_array_equal(box, ref_box)
    x1, y1, x2, y2 = box
    # The support must cover the masked neighbourhood of the source.
    assert x1 <= 30 <= x2 and y1 <= 20 <= y2


def test_trim_coeffs_box_and_embed(field):
    n_scales = 2
    coeffs = iuwt_ops.decompose(field, n_scales)
    out = np.asarray(
        iuwt_ops.trim_coeffs_box(coeffs, jnp.int32(8), jnp.int32(12), 2, 16, 20)
    )
    assert out.shape == (3, 16, 20)
    np.testing.assert_allclose(
        out[:2], np.asarray(coeffs)[:2, 8:24, 12:32], rtol=1e-6
    )
    assert (out[2] == 0).all()

    small = jnp.ones((2, 4, 5), jnp.float32)
    full = np.asarray(
        iuwt_ops.embed_box3_zeros(small, jnp.int32(3), jnp.int32(6), 10, 12)
    )
    assert full.shape == (2, 10, 12)
    assert (full[:, 3:7, 6:11] == 1).all()
    assert full.sum() == 2 * 4 * 5


def test_component_fit_ratio_recovers_scale_factor(field):
    """A model that is exactly half the dirty structure must fit factor 2."""
    H, W = field.shape
    n_scales = 2
    psf = np.zeros((H, W), np.float32)
    psf[H // 2, W // 2] = 1.0
    model = np.zeros((H, W), np.float32)
    model[20, 30] = 1.0
    dirty = 2.0 * model  # dirty = 2 * (model (x) delta-psf)
    mask = np.ones((n_scales, H, W), bool)
    area = np.zeros((H, W), bool)
    area[15:26, 25:36] = True
    masked_dirty = iuwt_ops.recompose(
        iuwt_ops.apply_mask(
            iuwt_ops.decompose(jnp.asarray(dirty), n_scales), jnp.asarray(mask)
        ),
        n_scales,
        False,
    )
    sums = np.asarray(
        iuwt_ops.component_fit_ratio(
            jnp.asarray(mask),
            jnp.asarray(model),
            masked_dirty,
            jnp.asarray(psf),
            jnp.asarray(area),
            n_scales,
        )
    )
    assert sums[1] / sums[0] == pytest.approx(2.0, rel=1e-4)


def test_conjugate_gradient_solves_delta_psf(field):
    """With a delta PSF and a full mask, CG must reproduce the dirty image."""
    H, W = field.shape
    n_scales = 2
    psf = jnp.zeros((H, W), jnp.float32).at[H // 2, W // 2].set(1.0)
    mask = jnp.ones((n_scales, H, W), bool)
    dirty_scales = iuwt_ops.apply_mask(
        iuwt_ops.decompose(field, n_scales), mask
    )
    masked_dirty = iuwt_ops.recompose(dirty_scales, n_scales, False)
    model, status = iuwt_ops.conjugate_gradient(
        dirty_scales, mask, masked_dirty, psf, n_scales
    )
    success, snr = np.asarray(status).tolist()
    assert bool(success)
    err = np.abs(np.asarray(model) - np.asarray(masked_dirty)).max()
    assert err < 5e-2 * float(jnp.abs(masked_dirty).max())


def test_rms_guard(field):
    H, W = field.shape
    psf = jnp.zeros((H, W), jnp.float32).at[H // 2, W // 2].set(1.0)
    guard = np.asarray(
        iuwt_ops.rms_guard(field, field, psf, jnp.float32(0.5))
    )
    rb = float(np.sqrt(np.mean(np.asarray(field) ** 2)))
    assert guard[0] == pytest.approx(rb, rel=1e-5)
    # Subtracting half the (delta-convolved) field halves the RMS.
    assert guard[1] == pytest.approx(0.5 * rb, rel=1e-4)
