"""Sharded Clark subminor (parallel/mesh.py::mesh_subminor_clean).

Semantics under the mesh follow the reference's FACETED fast path: each
tile cleans its own candidate set independently to the shared global
threshold (``subminor_loop.cc:62-115`` per sub-image under
``parallel_deconvolution.cc:606-617``).  Two parity anchors on the
8-virtual-device CPU mesh:

* a chan-only mesh (tile=1) must match the single-device subminor path
  (one tile == the global candidate set);
* a chan x tile mesh must match a host emulation that runs the serial
  subminor per row band (mask-restricted), i.e. the reference's
  per-sub-image behavior.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import radler_tpu as rd
from radler_tpu.parallel.mesh import make_mesh


def _problem(n_chan, size, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r2 = (yy - size // 2) ** 2 + (xx - size // 2) ** 2
    psf = np.exp(-r2 / 10.0).astype(np.float32)
    psf /= psf.max()
    sky = np.zeros((size, size), np.float32)
    for _ in range(10):
        cy, cx = rng.integers(8, size - 8, 2)
        sky[cy, cx] += rng.uniform(0.5, 2.0)
    conv = np.real(
        np.fft.ifft2(np.fft.fft2(sky) * np.fft.fft2(np.fft.ifftshift(psf)))
    ).astype(np.float32)
    res = np.stack([conv * (1.0 - 0.08 * c) for c in range(n_chan)])
    psfs = np.stack([psf] * n_chan)
    return psfs, res


def _run(use_mesh, n_chan, size=64, n_iter=200, mask=None):
    psfs, res0 = _problem(n_chan, size)
    res = res0.copy()
    mdl = np.zeros_like(res)
    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.minor_iteration_count = n_iter
    s.minor_loop_gain = 0.2
    s.major_loop_gain = 0.85
    s.generic.use_sub_minor_optimization = True
    if use_mesh:
        s.parallel.use_device_mesh = True
        s.parallel.n_devices = 8
    freqs = np.array(
        [[1.0e8 + c * 1e7, 1.1e8 + c * 1e7] for c in range(n_chan)]
    )
    r = rd.Radler(s, psfs, res, mdl, 0.0, frequencies=freqs)
    if mask is not None:
        r._clean_mask = mask
        r._parallel.set_clean_mask(mask)
    r.perform(0)
    return res, mdl, r.iteration_number


def test_mesh_subminor_chan_only_matches_single_device():
    """chan=8, tile=1: the tile-local candidate set IS the global set, so
    the sharded program must match the single-device subminor numerics."""
    mesh = make_mesh(8, n_channels=8)
    assert mesh.shape["chan"] == 8 and mesh.shape["tile"] == 1
    res_m, mdl_m, it_m = _run(True, n_chan=8)
    res_s, mdl_s, it_s = _run(False, n_chan=8)
    assert it_m == it_s
    np.testing.assert_allclose(res_m, res_s, atol=3e-5)
    np.testing.assert_allclose(mdl_m, mdl_s, atol=3e-5)


def test_mesh_subminor_tiles_match_banded_host_emulation():
    """chan=2, tile=4: per-tile independent cleaning to the shared
    threshold == the serial subminor run per row band (the reference's
    per-sub-image semantics)."""
    from radler_tpu.image_set import CubeMeta
    from radler_tpu.models.subminor import SubMinorLoop

    n_chan, size = 2, 64
    mesh = make_mesh(8, n_channels=n_chan)
    assert mesh.shape["chan"] == 2 and mesh.shape["tile"] == 4
    psfs, res0 = _problem(n_chan, size)
    meta = CubeMeta(
        n_channels=n_chan,
        n_polarizations=1,
        weights=(1.0,) * n_chan,
        linked=(True,),
        polarization_norm_factor=1.0,
        squared_joins=False,
        frequencies=tuple(1e8 + 1e7 * c for c in range(n_chan)),
    )
    # The public-API mesh run.
    res_m, mdl_m, it_m = _run(True, n_chan=n_chan)

    # Host emulation: peak/threshold as Radler computes them, then one
    # serial subminor per row band with a band mask, one shared correction.
    integ = np.einsum("c,chw->hw", [0.5, 0.5], res0)
    peak = np.abs(integ).max()
    first_threshold = max(peak * (1.0 - 0.85), 0.0)
    h_loc = size // 4
    delta_total = np.zeros_like(res0)
    iters = 0
    for t in range(4):
        band = np.zeros((size, size), bool)
        band[t * h_loc : (t + 1) * h_loc] = True
        sub = SubMinorLoop(size, size, size * 2, size * 2)
        sub.set_iteration_info(0, 200)
        sub.set_threshold(first_threshold, first_threshold * 0.99)
        sub.set_gain(0.2)
        sub.mask = band
        diverging, max_value = sub.run(
            jnp.asarray(res0), meta, jnp.asarray(psfs), None
        )
        assert not diverging
        if max_value is not None:
            delta_total += np.asarray(sub.full_model_cube())
            iters += sub.current_iteration
    from radler_tpu.models.subminor import _correct_residual

    res_ref = np.asarray(
        _correct_residual(
            jnp.asarray(res0),
            jnp.asarray(delta_total),
            jnp.asarray(psfs),
            size * 2,
            size * 2,
            n_chan,
        )
    )
    assert it_m == iters
    np.testing.assert_allclose(mdl_m, delta_total, atol=3e-5)
    np.testing.assert_allclose(res_m, res_ref, atol=3e-5)


def test_mesh_subminor_with_polynomial_fitter():
    """Spectral fitting inside the sharded candidate loop must match the
    single-device subminor (chan-only mesh: identical semantics)."""
    n_chan, size = 8, 64
    psfs, res0 = _problem(n_chan, size)

    def run(use_mesh):
        res = res0.copy()
        mdl = np.zeros_like(res)
        s = rd.Settings()
        s.trimmed_image_width = size
        s.trimmed_image_height = size
        s.minor_iteration_count = 150
        s.minor_loop_gain = 0.2
        s.major_loop_gain = 0.85
        s.generic.use_sub_minor_optimization = True
        s.spectral_fitting.mode = rd.SpectralFittingMode.POLYNOMIAL
        s.spectral_fitting.terms = 2
        if use_mesh:
            s.parallel.use_device_mesh = True
            s.parallel.n_devices = 8
        freqs = np.array(
            [[1.0e8 + c * 1e7, 1.1e8 + c * 1e7] for c in range(n_chan)]
        )
        r = rd.Radler(s, psfs, res, mdl, 0.0, frequencies=freqs)
        r.perform(0)
        return res, mdl, r.iteration_number

    res_m, mdl_m, it_m = run(True)
    res_s, mdl_s, it_s = run(False)
    assert it_m == it_s
    np.testing.assert_allclose(res_m, res_s, atol=5e-5)
    np.testing.assert_allclose(mdl_m, mdl_s, atol=5e-5)


def test_mesh_subminor_capacity_overflow_drops_dimmest():
    """More candidates than the per-tile capacity: the brightest-first
    top-k gather must still clean (the dimmest set members are the ones a
    capped buffer can safely drop — they are below the loop's stopping
    threshold soonest)."""
    from radler_tpu.image_set import CubeMeta
    from radler_tpu.parallel.mesh import make_mesh, mesh_subminor_clean
    import jax.numpy as jnp

    size = 64
    psfs, res = _problem(2, size)
    meta = CubeMeta(
        n_channels=2,
        n_polarizations=1,
        weights=(1.0, 1.0),
        linked=(True,),
        polarization_norm_factor=1.0,
        squared_joins=False,
        frequencies=(1e8, 1.1e8),
    )
    mesh = make_mesh(8, n_channels=2)
    integ = np.einsum("c,chw->hw", [0.5, 0.5], res)
    peak = float(np.abs(integ).max())
    thr = 0.2 * peak
    delta, it, final_max, diverging, any_sel = mesh_subminor_clean(
        mesh,
        jnp.asarray(res),
        jnp.asarray(psfs),
        jnp.ones((size, size), jnp.float32),
        jnp.ones((size, size), bool),
        thr * 0.99,
        thr,
        0.2,
        0,
        500,
        4.0,
        cap=16,  # far fewer than the above-threshold pixel count
        meta=meta,
        allow_negative=True,
        stop_on_negative=False,
        fitter=None,
        use_rms=False,
    )
    assert bool(any_sel) and not bool(diverging)
    assert int(it) > 0
    assert abs(float(final_max)) <= thr * 1.01 or int(it) == 500
    assert np.isfinite(np.asarray(delta)).all()


def test_mesh_subminor_respects_mask():
    n_chan, size = 2, 64
    mask = np.zeros((size, size), bool)
    mask[: size // 2] = True  # only the top half is cleanable
    res_m, mdl_m, _ = _run(True, n_chan=n_chan, mask=mask)
    assert np.abs(mdl_m[:, size // 2 :, :]).max() == 0.0
    assert np.abs(mdl_m).max() > 0.0
