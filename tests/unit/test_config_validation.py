import pytest

from low_light_image_enhancement_tpu.config import MARGIN, PipelineConfig


def test_unknown_method_rejected():
    with pytest.raises(ValueError, match="unknown method"):
        PipelineConfig(method="retnex")


def test_blur_radius_beyond_default_margin_widens_canvas():
    """Round 4: blur radii past the old MARGIN cap are no longer rejected —
    the canvas margin adapts instead (config.canvas_margin)."""
    from low_light_image_enhancement_tpu.config import canvas_margin

    cfg = PipelineConfig(blur_radius=MARGIN)  # receptive 5 > MARGIN
    assert canvas_margin(cfg) == 8
    assert canvas_margin(PipelineConfig()) == MARGIN


def test_denoise_strength_bounds():
    with pytest.raises(ValueError):
        PipelineConfig(denoise_strength=1.5)
    PipelineConfig(denoise_strength=0.0)  # ok, disables denoise


def test_curve_downsample_validated():
    with pytest.raises(ValueError):
        PipelineConfig(curve_downsample=0)


def test_replace_revalidates():
    cfg = PipelineConfig()
    with pytest.raises(ValueError):
        cfg.replace(method="nope")
