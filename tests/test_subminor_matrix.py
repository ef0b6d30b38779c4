"""The K x K PSF interaction-matrix fast path of the Clark subminor loop
must be numerically identical to the per-iteration gather path
(``subminor_loop.cc:91-105`` semantics either way)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radler_tpu.image_set import CubeMeta
from radler_tpu.models import subminor as sm


def _make_problem(size=64, n_channels=2, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    r2 = (yy - size // 2) ** 2.0 + (xx - size // 2) ** 2.0
    psf = np.exp(-r2 / (2.0 * 1.5**2)).astype(np.float32)
    psfs = np.stack([psf * (1.0 - 0.05 * c) for c in range(n_channels)])
    residual = np.zeros((n_channels, size, size), np.float32)
    for y, x, a in [(20, 22, 1.0), (40, 31, 0.7), (21, 45, 0.5)]:
        for c in range(n_channels):
            patch = a * (1.0 + 0.1 * c) * np.roll(
                np.roll(psf, y - size // 2, 0), x - size // 2, 1
            )
            residual[c] += patch.astype(np.float32)
    residual += rng.normal(0.0, 1e-3, residual.shape).astype(np.float32)
    meta = CubeMeta(
        n_channels=n_channels,
        n_polarizations=1,
        weights=tuple([1.0] * n_channels),
        linked=(True,),
        polarization_norm_factor=1.0,
        squared_joins=False,
        frequencies=tuple(1e8 * (1 + c) for c in range(n_channels)),
    )
    return psfs, residual, meta


def _run(force_matrix, monkeypatch):
    psfs, residual, meta = _make_problem()
    size = residual.shape[-1]
    if force_matrix:
        monkeypatch.setattr(sm, "_MATRIX_MAX_K", 1 << 20)
    else:
        monkeypatch.setattr(sm, "_MATRIX_MAX_K", 0)
    loop = sm.SubMinorLoop(size, size, size * 2, size * 2)
    loop.set_threshold(0.02, 0.02)
    loop.set_iteration_info(0, 100_000)  # remaining >> K so the gate passes
    loop.set_gain(0.2)
    loop.allow_negative_components = True
    diverging, peak = loop.run(jnp.asarray(residual), meta, jnp.asarray(psfs))
    assert not diverging
    new_res, model = loop.correct_residual_dirty(
        jnp.asarray(residual), jnp.asarray(psfs)
    )
    return (
        np.asarray(new_res),
        np.asarray(model),
        loop.current_iteration,
        peak,
    )


def test_matrix_path_matches_gather_path(monkeypatch):
    res_a, mod_a, it_a, peak_a = _run(False, monkeypatch)
    res_b, mod_b, it_b, peak_b = _run(True, monkeypatch)
    assert it_a == it_b
    assert peak_a == pytest.approx(peak_b, abs=1e-7)
    np.testing.assert_allclose(mod_a, mod_b, atol=1e-6)
    np.testing.assert_allclose(res_a, res_b, atol=1e-6)
    # The run must actually have cleaned something.
    assert it_a > 10
    assert np.abs(res_a).max() < np.abs(
        np.asarray(_make_problem()[1])
    ).max()


def test_psf_matrix_values():
    psfs, _, _ = _make_problem()
    H = W = psfs.shape[-1]
    xs = jnp.asarray([5, 10, 63], jnp.int32)
    ys = jnp.asarray([7, 12, 0], jnp.int32)
    valid = jnp.asarray([True, True, False])
    mat = np.asarray(
        sm._build_psf_matrix(
            jnp.asarray(psfs), xs, ys, valid, height=H, width=W
        )
    )
    assert mat.shape == (psfs.shape[0], 3, 3)
    for j in range(2):
        for k in range(3):
            dy = int(ys[j] - ys[k]) + H // 2
            dx = int(xs[j] - xs[k]) + W // 2
            if 0 <= dy < H and 0 <= dx < W:
                np.testing.assert_allclose(
                    mat[:, j, k], psfs[:, dy, dx], rtol=1e-6
                )
    # invalid j row is zeroed
    assert (mat[:, 2, :] == 0.0).all()
