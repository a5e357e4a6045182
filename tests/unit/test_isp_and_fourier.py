import numpy as np
import jax.numpy as jnp

from low_light_image_enhancement_tpu.ops.fourier import (
    amplitude_phase_swap,
    fourier_amplitude_boost,
)
from low_light_image_enhancement_tpu.ops.isp import (
    DEFAULT_CCM,
    color_correction,
    demosaic_bilinear_rggb,
    gray_world_gains,
    raw_to_srgb,
    white_balance,
)


def _mosaic_rggb(rgb):
    """Build an RGGB mosaic from a planar RGB image (numpy oracle)."""
    c, h, w = rgb.shape
    out = np.zeros((h, w), rgb.dtype)
    out[0::2, 0::2] = rgb[0, 0::2, 0::2]  # R
    out[0::2, 1::2] = rgb[1, 0::2, 1::2]  # G
    out[1::2, 0::2] = rgb[1, 1::2, 0::2]  # G
    out[1::2, 1::2] = rgb[2, 1::2, 1::2]  # B
    return out


def test_demosaic_recovers_constant_image():
    rgb = np.stack([np.full((16, 16), v, np.float32) for v in (0.2, 0.5, 0.8)])
    raw = _mosaic_rggb(rgb)
    out = np.asarray(demosaic_bilinear_rggb(jnp.asarray(raw)))
    np.testing.assert_allclose(out, rgb, atol=1e-6)


def test_demosaic_smooth_gradient_close():
    h = w = 32
    ramp = np.linspace(0.1, 0.9, w, dtype=np.float32)
    rgb = np.stack([np.tile(ramp, (h, 1))] * 3)
    raw = _mosaic_rggb(rgb)
    out = np.asarray(demosaic_bilinear_rggb(jnp.asarray(raw)))
    # interior within a small tolerance (wrap edges excluded)
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], rgb[:, 2:-2, 2:-2],
                               atol=0.04)


def test_white_balance_and_gray_world():
    rgb = jnp.stack([
        jnp.full((8, 8), 0.2), jnp.full((8, 8), 0.4), jnp.full((8, 8), 0.1)
    ]).astype(jnp.float32)
    gains = gray_world_gains(rgb)
    balanced = white_balance(rgb, gains)
    means = np.asarray(balanced).mean(axis=(1, 2))
    np.testing.assert_allclose(means, means[1], atol=1e-5)


def test_color_correction_identity():
    rgb = jnp.asarray(np.random.default_rng(0).random((3, 8, 8), np.float32))
    out = color_correction(rgb, np.eye(3, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-6)


def test_raw_to_srgb_pipeline_shapes_and_brightening():
    rng = np.random.default_rng(1)
    rgb = rng.random((3, 32, 32)).astype(np.float32) * 0.2  # dark scene
    raw = _mosaic_rggb(rgb)
    out = np.asarray(raw_to_srgb(jnp.asarray(raw)))
    assert out.shape == (3, 32, 32)
    assert out.mean() > rgb.mean()  # display gamma brightens dark content
    np.testing.assert_array_less(out, 1.0 + 1e-6)


def test_raw_to_srgb_batched():
    rng = np.random.default_rng(2)
    raws = jnp.asarray(rng.random((4, 16, 16), np.float32))
    out = raw_to_srgb(raws)
    assert out.shape == (4, 3, 16, 16)


def test_fourier_boost_brightens_preserves_structure():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((3, 32, 32), np.float32) * 0.3)
    y = np.asarray(fourier_amplitude_boost(x, 1.8))
    assert y.mean() > float(x.mean()) * 1.3
    # structure: correlation of gradients stays high
    gx = np.diff(np.asarray(x), axis=-1).ravel()
    gy = np.diff(y, axis=-1).ravel()
    corr = np.corrcoef(gx, gy)[0, 1]
    assert corr > 0.8


def test_fourier_boost_preserve_dc_keeps_mean():
    x = jnp.asarray(np.random.default_rng(4).random((16, 16), np.float32) * 0.4 + 0.2)
    y = np.asarray(fourier_amplitude_boost(x, 1.5, preserve_dc=True))
    assert abs(y.mean() - float(x.mean())) < 0.05


def test_amplitude_phase_swap_takes_style_brightness():
    rng = np.random.default_rng(5)
    dark = jnp.asarray(rng.random((16, 16), np.float32) * 0.2)
    bright = jnp.asarray(rng.random((16, 16), np.float32) * 0.5 + 0.4)
    out = np.asarray(amplitude_phase_swap(dark, bright))
    assert out.mean() > float(dark.mean()) * 1.5
