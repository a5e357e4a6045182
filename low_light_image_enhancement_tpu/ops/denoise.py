"""Bilateral-lite 3x3 denoise expressed as 9 shifted taps.

Spatial weights are the separable [1/4, 1/2, 1/4] binomial; range weights are
a Gaussian on per-channel value difference. The structure (9 static shifts,
fixed accumulation order) is mirrored exactly by the fused Pallas kernel,
which calls ``bilateral_core`` with a ``pltpu.roll``-based shift function.

Spec: BASELINE.json north_star ("fused denoise") and config 5 per-shard
denoise (BASELINE.json:11).
"""

from __future__ import annotations

import jax.numpy as jnp

from low_light_image_enhancement_tpu.ops.filters import roll2d, shift2d

_SPATIAL_1D = (0.25, 0.5, 0.25)


def bilateral_core(x, inv2s2, strength, shift_fn):
    """3x3 bilateral filter as 9 shifted taps over the last two axes.

    ``shift_fn(x, dy, dx)`` supplies boundary semantics; the Pallas kernel
    passes a roll-based shift, the public op passes edge-replicate.
    """
    acc = jnp.zeros_like(x)
    wacc = jnp.zeros_like(x)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            s = shift_fn(x, di, dj)
            d = s - x
            w = (_SPATIAL_1D[di + 1] * _SPATIAL_1D[dj + 1]) * jnp.exp(
                -(d * d) * inv2s2
            )
            acc = acc + w * s
            wacc = wacc + w
    filtered = acc / wacc
    return x + strength * (filtered - x)


def bilateral_denoise(
    x: jnp.ndarray,
    sigma_range: float = 0.12,
    strength: float = 0.5,
    mode: str = "clamp",
) -> jnp.ndarray:
    """Edge-preserving 3x3 filter over the last two axes, blended by
    ``strength`` (0 = passthrough). Works on any planar layout.

    mode="clamp": edge-replicate boundary (public-op semantics).
    mode="wrap":  circular boundary for pre-padded inputs (pipeline core).
    """
    if strength == 0.0:
        return x
    shift_fn = shift2d if mode == "clamp" else roll2d
    inv2s2 = 1.0 / (2.0 * sigma_range * sigma_range)
    return bilateral_core(x, inv2s2, strength, shift_fn)
