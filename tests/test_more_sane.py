"""MoreSane external-tool integration (``cpp/algorithms/more_sane.cc:15-86``).

Uses a fake MORESANE script so the test exercises the full loop: residual
add-back, dirty/PSF FITS export, subprocess invocation with sigma levels,
and model/residual FITS read-back.
"""

import os
import textwrap

import numpy as np
import pytest

import radler_tpu as rd

SIZE = 32

FAKE_MORESANE = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from radler_tpu.utils.fits import read_fits_image, write_fits_image

    args = sys.argv[1:]
    sigma = None
    if "-sl" in args:
        i = args.index("-sl")
        sigma = float(args[i + 1])
        del args[i : i + 2]
    dirty_name, psf_name, output_name = args[-3:]
    dirty = read_fits_image(dirty_name)
    # "Deconvolve": claim everything above 0.5 as model flux.
    model = dirty * (dirty > 0.5)
    write_fits_image(output_name + "_model.fits", model)
    write_fits_image(output_name + "_residual.fits", dirty - model)
    with open(output_name + ".log", "w") as f:
        f.write(f"sigma={{sigma}}\\n")
    """
)


def test_more_sane_roundtrip(tmp_path):
    os.chdir(tmp_path)
    script = tmp_path / "fake_moresane.py"
    script.write_text(
        FAKE_MORESANE.format(repo=os.path.dirname(os.path.dirname(__file__)))
    )

    psf = np.zeros((SIZE, SIZE), np.float32)
    psf[SIZE // 2, SIZE // 2] = 1.0
    residual = np.zeros((SIZE, SIZE), np.float32)
    residual[10, 12] = 2.0
    residual[20, 5] = 0.25  # below the fake tool's 0.5 cut: stays in residual
    model = np.zeros_like(residual)

    s = rd.Settings()
    s.algorithm_type = rd.AlgorithmType.MORE_SANE
    s.trimmed_image_width = SIZE
    s.trimmed_image_height = SIZE
    s.pixel_scale.x = s.pixel_scale.y = 1.0 / 60.0 * (np.pi / 180.0)
    s.major_iteration_count = 1
    s.more_sane.location = str(script)
    s.more_sane.sigma_levels = [3.0, 2.0]

    r = rd.Radler(s, psf, residual, model, 0.0)
    r.perform(0)

    assert model[10, 12] == pytest.approx(2.0)
    assert model[20, 5] == 0.0
    assert residual[10, 12] == pytest.approx(0.0)
    assert residual[20, 5] == pytest.approx(0.25)
    # First major iteration uses the first sigma level.
    assert "sigma=3.0" in (
        tmp_path / "wsclean-tmp-moresaneoutput0.log"
    ).read_text()
    # Temporary FITS files are cleaned up after the run.
    assert not os.path.exists("wsclean-tmp-moresaneinput-dirty.fits")
