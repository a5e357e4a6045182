"""Batched, jittable PSNR and SSIM (BASELINE.json metric: "PSNR/SSIM delta").

Layout convention: SSIM filters over the last two axes (planar layout). For
the common u8 HWC case use the ``*_u8`` helpers which transpose first.
"""

from __future__ import annotations

import jax.numpy as jnp

from low_light_image_enhancement_tpu.ops.filters import separable_blur, shift2d


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB. Returns per-image values for batched
    inputs (reduction over all but the first axis), a scalar for single
    images (ndim <= 3 reduces everything)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim > 3:
        axes = tuple(range(1, a.ndim))
        mse = jnp.mean((a - b) ** 2, axis=axes)
    else:
        mse = jnp.mean((a - b) ** 2)
    mse = jnp.maximum(mse, 1e-12)
    return 10.0 * jnp.log10((max_val * max_val) / mse)


def _ssim_blur(x, radius, sigma):
    return separable_blur(x, radius, sigma, shift2d)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_val: float = 1.0,
    radius: int = 5,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM with an 11x11 Gaussian window (edge-replicate boundary,
    'same' output — slightly more lenient at borders than the 'valid'
    convention but consistent across every path we compare).

    Planar layout: spatial axes must be the last two. Returns per-image means
    for batched input (B, C, H, W), a scalar for (C, H, W) / (H, W).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _ssim_blur(a, radius, sigma)
    mu_b = _ssim_blur(b, radius, sigma)
    var_a = _ssim_blur(a * a, radius, sigma) - mu_a * mu_a
    var_b = _ssim_blur(b * b, radius, sigma) - mu_b * mu_b
    cov = _ssim_blur(a * b, radius, sigma) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    )
    if a.ndim > 3:
        return jnp.mean(s, axis=tuple(range(1, s.ndim)))
    return jnp.mean(s)


def psnr_u8(a_u8: jnp.ndarray, b_u8: jnp.ndarray) -> jnp.ndarray:
    return psnr(a_u8.astype(jnp.float32) / 255.0,
                b_u8.astype(jnp.float32) / 255.0)


def ssim_u8(a_u8: jnp.ndarray, b_u8: jnp.ndarray) -> jnp.ndarray:
    """u8 (..., H, W, 3) channels-last -> mean SSIM (planar transposed)."""
    a = jnp.moveaxis(a_u8.astype(jnp.float32) / 255.0, -1, -3)
    b = jnp.moveaxis(b_u8.astype(jnp.float32) / 255.0, -1, -3)
    return ssim(a, b)


# --------------------------------------------------------------- color -- #

def _srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x <= 0.04045, x / 12.92,
                     ((x + 0.055) / 1.055) ** 2.4)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB [0,1] (..., 3, H, W) planar -> CIE L*a*b* (D65). Standard
    sRGB->XYZ matrix + the cube-root transfer with its linear toe."""
    lin = _srgb_to_linear(rgb.astype(jnp.float32))
    r, g, b = lin[..., 0, :, :], lin[..., 1, :, :], lin[..., 2, :, :]
    x = 0.4124564 * r + 0.3575761 * g + 0.1804375 * b
    y = 0.2126729 * r + 0.7151522 * g + 0.0721750 * b
    z = 0.0193339 * r + 0.1191920 * g + 0.9503041 * b
    # normalize by D65 white point
    xn, yn, zn = 0.95047, 1.0, 1.08883

    def f(t):
        d = 6.0 / 29.0
        return jnp.where(t > d ** 3, jnp.cbrt(t),
                         t / (3 * d * d) + 4.0 / 29.0)

    fx, fy, fz = f(x / xn), f(y / yn), f(z / zn)
    l_ = 116.0 * fy - 16.0
    a_ = 500.0 * (fx - fy)
    b_ = 200.0 * (fy - fz)
    return jnp.stack([l_, a_, b_], axis=-3)


def delta_e76(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean CIE76 color difference (Euclidean in Lab; ~2.3 is one JND)
    between planar sRGB images. Per-image for batched inputs."""
    d = rgb_to_lab(a) - rgb_to_lab(b)
    de = jnp.sqrt(jnp.sum(d * d, axis=-3) + 1e-12)
    if de.ndim > 2:
        return jnp.mean(de, axis=tuple(range(1, de.ndim)))
    return jnp.mean(de)


def delta_e76_u8(a_u8: jnp.ndarray, b_u8: jnp.ndarray) -> jnp.ndarray:
    """u8 (..., H, W, 3) channels-last -> mean CIE76 delta-E."""
    a = jnp.moveaxis(a_u8.astype(jnp.float32) / 255.0, -1, -3)
    b = jnp.moveaxis(b_u8.astype(jnp.float32) / 255.0, -1, -3)
    return delta_e76(a, b)
