"""Mesh-sharded IUWT: parity vs the single-device run on 8 virtual devices.

The IUWT hot path is row-parallel by construction — the à-trous decompose is
separable 5-tap shifts (``iuwt_decomposition.cc:9-53``) and the masked CG is
convolution stacks (``iuwt_deconvolution_algorithm.cc:326-407``).  Laying
image rows over the ("chan", "tile") mesh lets XLA partition the jitted
programs; the host-side flood-fill stays unsharded.
"""

import numpy as np
import pytest

import radler_tpu as rd


def _problem(size=256, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r2 = (yy - size // 2) ** 2 + (xx - size // 2) ** 2
    psf = np.exp(-r2 / (2 * 2.5**2))
    psf += 0.06 * np.exp(-((np.sqrt(r2) - 14.0) ** 2) / 6)
    psf = psf.astype(np.float32)
    sky = np.zeros((size, size), np.float32)
    for _ in range(10):
        cy, cx = rng.integers(size // 8, 7 * size // 8, 2)
        s = rng.uniform(1.5, 10)
        a = rng.uniform(0.3, 1.0)
        m = max(1, int(4 * s))
        y0, y1 = max(0, cy - m), min(size, cy + m)
        x0, x1 = max(0, cx - m), min(size, cx + m)
        sky[y0:y1, x0:x1] += a * np.exp(
            -((yy[y0:y1, x0:x1] - cy) ** 2 + (xx[y0:y1, x0:x1] - cx) ** 2)
            / (2 * s * s)
        )
    residual = np.real(
        np.fft.ifft2(np.fft.fft2(sky) * np.fft.fft2(np.fft.ifftshift(psf)))
    ).astype(np.float32)
    return psf, residual


def _run(use_mesh):
    psf, residual = _problem()
    size = residual.shape[0]
    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.algorithm_type = rd.AlgorithmType.IUWT
    s.minor_iteration_count = 6
    s.major_loop_gain = 0.8
    s.parallel.use_device_mesh = use_mesh
    model = np.zeros_like(residual)
    resid = residual.copy()
    r = rd.Radler(s, psf, resid, model, 0.0)
    r.perform(0)
    return residual, resid, model, r.iteration_number


@pytest.mark.slow
def test_mesh_iuwt_matches_single_device():
    res0, res_1, mdl_1, it_1 = _run(False)
    _, res_m, mdl_m, it_m = _run(True)
    # The run actually deconvolved.
    assert float(np.sqrt(np.mean(res_1**2))) < 0.9 * float(
        np.sqrt(np.mean(res0**2))
    )
    assert it_m == it_1
    scale = max(1.0, float(np.abs(res_1).max()))
    assert np.abs(res_m - res_1).max() / scale < 2e-5
    assert np.abs(mdl_m - mdl_1).max() / scale < 2e-5


def test_iuwt_engine_sharding_applied():
    """The engine really lays rows over the mesh (not a silent no-op)."""
    import jax
    import jax.numpy as jnp
    from radler_tpu.models.iuwt import _IuwtEngine
    from radler_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, n_channels=2)
    eng = _IuwtEngine(
        256, 256, 0.2, 0.8, 0.0, False, None, 0.0, mesh=mesh
    )
    arr = eng._shard_rows(jnp.zeros((256, 256)))
    assert arr.sharding.spec[0] is not None
    stack = eng._shard_rows(jnp.zeros((5, 256, 256)), row_axis=1)
    assert stack.sharding.spec[1] is not None


def _run_asp(use_mesh, size=256):
    # NB: returns (psf, dirty, residual, model, iterations).
    # ASP needs a beam-like PSF (the centred-Gaussian fit drives the scale
    # selection); use a plain Gaussian beam rather than the ringed IUWT one.
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r2 = (yy - size // 2) ** 2 + (xx - size // 2) ** 2
    psf = np.exp(-r2 / (2 * 2.5**2)).astype(np.float32)
    rng = np.random.default_rng(3)
    sky = np.zeros((size, size), np.float32)
    ys = rng.integers(size // 4, 3 * size // 4, 8)
    xs = rng.integers(size // 4, 3 * size // 4, 8)
    np.add.at(sky, (ys, xs), rng.uniform(0.5, 1.5, 8).astype(np.float32))
    residual = np.real(
        np.fft.ifft2(np.fft.fft2(sky) * np.fft.fft2(np.fft.ifftshift(psf)))
    ).astype(np.float32)
    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.algorithm_type = rd.AlgorithmType.ADAPTIVE_SCALE_PIXEL
    s.minor_iteration_count = 600
    s.major_loop_gain = 0.8
    s.absolute_threshold = 0.1
    s.parallel.use_device_mesh = use_mesh
    model = np.zeros_like(residual)
    resid = residual.copy()
    r = rd.Radler(s, psf, resid, model, 0.0)
    # Drive the major loop to the absolute threshold: at convergence the
    # chaotic per-component path differences wash out of the TOTALS (each
    # run has removed essentially all emission above the threshold), which
    # is what makes the flux-conservation bound meaningful.  The caps are
    # generous so BOTH runs genuinely reach the threshold — a capped run
    # leaves path-dependent flux on the table and fails the bound.
    major = 0
    while r.perform(major) and major < 16:
        major += 1
    return psf, residual, resid, model, r.iteration_number


@pytest.mark.slow
def test_mesh_asp_matches_single_device():
    """ASP's scale-bank convolutions and per-component subtractions ride
    the mesh via row sharding (``asp_algorithm.cc:256-371`` semantics).

    Exact parity is not expected: ASP fits a nonlinear 2-D Gaussian at
    every peak, and the sharded reductions' float ordering perturbs the
    fit inputs enough that later component placements diverge chaotically.
    The contract is behavioral equivalence plus per-run flux bookkeeping.

    A cross-run total-flux bound was tried first and measured
    UNFALSIFIABLE: two SINGLE-DEVICE runs of this exact configuration
    recover 3.8 vs 8.1 total model flux on identical inputs (CPU
    multi-threaded reductions are not run-to-run deterministic, and a
    one-ulp difference in a Gaussian-fit input flips a component between
    the point and Gaussian paths, after which the runs diverge
    chaotically).  What IS deterministic per run is the bookkeeping
    identity the reference maintains (``asp_algorithm.cc:256-371``:
    every subtraction from the residual adds the matching component to
    the model): dirty ≈ model ⊛ psf + residual.  A mesh path that
    cleans wrongly (double-subtracts across shards, drops components,
    mismatches values) breaks that identity."""
    psf, res0, res_1, mdl_1, it_1 = _run_asp(False)
    _, _, res_m, mdl_m, it_m = _run_asp(True)
    rms_0 = float(np.sqrt(np.mean(res0**2)))
    size = res0.shape[0]
    psf_f = np.fft.rfft2(np.fft.ifftshift(psf))
    for res, mdl, it in ((res_1, mdl_1, it_1), (res_m, mdl_m, it_m)):
        assert it > 0
        assert np.isfinite(res).all() and np.isfinite(mdl).all()
        assert float(np.abs(mdl).max()) > 0
        assert float(np.sqrt(np.mean(res**2))) < 0.8 * rms_0
        # Per-run flux bookkeeping: dirty = model (*) psf + residual.
        mp = np.fft.irfft2(np.fft.rfft2(mdl) * psf_f, s=(size, size))
        err = float(np.sqrt(np.mean((res0 - mp - res) ** 2)))
        assert err < 0.02 * rms_0, err


@pytest.mark.slow
def test_mesh_asp_non_divisible_rows():
    """Row counts that do not divide the tile axis still shard (GSPMD
    leaves the last shard short) instead of silently running unsharded."""
    _, res0, res_m, mdl_m, it_m = _run_asp(True, size=250)
    assert it_m > 0
    assert np.isfinite(res_m).all() and np.isfinite(mdl_m).all()
    rms_0 = float(np.sqrt(np.mean(res0**2)))
    assert float(np.sqrt(np.mean(res_m**2))) < 0.8 * rms_0
