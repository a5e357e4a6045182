"""Retinex decomposition: illumination-map estimation and reflectance.

Classical max-RGB Retinex (LIME-style; cf. Retinex-RAWMamba decomposition
framing, PAPERS.md:5): the illumination map is a smoothed per-pixel max over
RGB; reflectance is the input divided by illumination; enhancement brightens
the illumination with a gamma (<1) and recombines.

Spec: BASELINE.json north_star ("Retinex-style illumination-map estimation
and reflectance division") and config 1 (BASELINE.json:7).
"""

from __future__ import annotations

import jax.numpy as jnp

from low_light_image_enhancement_tpu.ops.filters import gaussian_blur


def illumination_map(
    rgb: jnp.ndarray,
    radius: int = 2,
    sigma: float = 1.0,
    mode: str = "clamp",
) -> jnp.ndarray:
    """Smoothed max-RGB illumination estimate. (..., 3, H, W) -> (..., H, W)."""
    l0 = jnp.max(rgb, axis=-3)
    return gaussian_blur(l0, radius=radius, sigma=sigma, mode=mode)


def reflectance(rgb: jnp.ndarray, illum: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """R = I / max(L, eps), broadcasting the illumination plane over RGB."""
    return rgb / jnp.maximum(illum, eps)[..., None, :, :]


def retinex_enhance(
    rgb: jnp.ndarray,
    gamma: float = 0.45,
    eps: float = 1e-3,
    radius: int = 2,
    sigma: float = 1.0,
    mode: str = "clamp",
) -> jnp.ndarray:
    """Full classical enhance: R * L**gamma, computed in the algebraically
    fused form x * L_safe**(gamma - 1) (one transcendental chain instead of a
    divide plus a power — the exact formula the Pallas kernel uses)."""
    illum = illumination_map(rgb, radius=radius, sigma=sigma, mode=mode)
    l_safe = jnp.clip(illum, eps, 1.0)
    boost = jnp.exp((gamma - 1.0) * jnp.log(l_safe))
    return jnp.clip(rgb * boost[..., None, :, :], 0.0, 1.0)
