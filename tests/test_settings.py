"""Settings defaults mirror the reference (``python/test/test_settings.py``
and ``cpp/settings.h``)."""

import radler_tpu as rd


def test_defaults():
    s = rd.Settings()
    assert s.trimmed_image_width == 0
    assert s.trimmed_image_height == 0
    assert s.channels_out == 1
    assert s.pixel_scale.x == 0.0
    assert s.pixel_scale.y == 0.0
    assert s.prefix_name == "wsclean"
    assert s.thread_count > 0
    assert s.linked_polarizations == set()
    assert s.parallel.grid_width == 1
    assert s.parallel.grid_height == 1
    assert s.absolute_threshold == 0.0
    assert s.minor_loop_gain == 0.1
    assert s.major_loop_gain == 1.0
    assert s.auto_threshold_sigma is None
    assert s.auto_mask_sigma is None
    assert s.absolute_auto_mask_threshold is None
    assert s.save_source_list is False
    assert s.minor_iteration_count == 0
    assert s.major_iteration_count == 12
    assert s.major_auto_mask_iteration_count == 2
    assert s.divergence_limit == 4.0
    assert s.allow_negative_components is True
    assert s.stop_on_negative_components is False
    assert s.squared_joins is False
    assert s.spectral_correction_frequency == 0.0
    assert s.spectral_correction == []
    assert s.border_ratio == 0.0
    assert s.fits_mask == ""
    assert s.casa_mask == ""
    assert s.horizon_mask_distance is None
    assert s.horizon_mask_filename == ""
    assert s.component_optimization_algorithm == rd.OptimizationAlgorithm.CLEAN
    assert s.local_rms.method == rd.LocalRmsMethod.NONE
    assert s.local_rms.window == 25.0
    assert s.local_rms.image == ""
    assert s.local_rms.strength == 1.0
    assert s.spectral_fitting.mode == rd.SpectralFittingMode.NO_FITTING
    assert s.spectral_fitting.terms == 0
    assert s.spectral_fitting.forced_filename == ""
    assert s.algorithm_type == rd.AlgorithmType.GENERIC_CLEAN
    assert s.python.filename == ""
    assert s.more_sane.location == ""
    assert s.more_sane.arguments == ""
    assert s.more_sane.sigma_levels == []
    assert s.multiscale.fast_sub_minor_loop is True
    assert s.multiscale.sub_minor_loop_gain == 0.2
    assert s.multiscale.scale_bias == 0.6
    assert s.multiscale.max_scales == 0
    assert s.multiscale.convolution_padding == 1.1
    assert s.multiscale.scale_list == []
    assert s.multiscale.shape == rd.MultiscaleShape.TAPERED_QUADRATIC
    assert s.generic.use_sub_minor_optimization is True


def test_independent_instances():
    """Nested settings must not be shared between instances."""
    a = rd.Settings()
    b = rd.Settings()
    a.multiscale.scale_list.append(5.0)
    a.pixel_scale.x = 1.0
    assert b.multiscale.scale_list == []
    assert b.pixel_scale.x == 0.0
