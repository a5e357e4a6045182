"""Guided filter (He et al.) — edge-aware smoothing in O(1) per pixel
regardless of radius.

Planar layout like every op here: images are ``(..., H, W)`` planes. The
box sums run on integral images (``jnp.cumsum`` + two shifted differences
per axis), so the cost is constant in ``radius`` — unlike the bilateral's
O(taps) shifted reads — making large smoothing radii free. Edge windows
are true means (normalized by a box-counted ones plane), matching
replicate-free SAME semantics.

Spec: BASELINE.json north_star "fused denoise" family; this is the
measured-alternative pattern the bilateral variants follow
(docs/PERFORMANCE.md "What bounds the bilateral") — kept as a public op;
the fused Pallas tail ships the bilateral.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_mean(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(..., H, W) -> windowed mean over (2r+1)^2, true means at edges.

    Integral-image form: cumsum along each axis, then one subtraction per
    axis gives the window SUM; dividing by the same operator applied to a
    ones plane yields the exact mean for truncated edge windows.
    """
    if radius < 1:
        return x
    ones = jnp.ones(x.shape[-2:], x.dtype)
    return _box_sum(x, radius) / _box_sum(ones, radius)


def _box_sum_1d(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    c = jnp.cumsum(x, axis=-1)
    # window sum at i = c[min(i + r, n-1)] - c[i - r - 1]   (c[-1] := 0)
    hi = jnp.clip(jnp.arange(n) + r, 0, n - 1)
    lo = jnp.arange(n) - r - 1
    c_hi = c[..., hi]
    c_lo = jnp.where(lo >= 0, c[..., jnp.clip(lo, 0, n - 1)], 0)
    return jnp.moveaxis(c_hi - c_lo, -1, axis)


def _box_sum(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return _box_sum_1d(_box_sum_1d(x, r, -1), r, -2)


def guided_filter(
    p: jnp.ndarray,
    guide: jnp.ndarray,
    radius: int = 2,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """Filter plane(s) ``p`` (..., H, W) with a shared single-plane
    ``guide`` (broadcastable to p): output is locally a linear transform
    of the guide, so edges present in the guide survive while everything
    else smooths. ``eps`` is the edge/flat threshold in guide-variance
    units (larger -> closer to a plain box blur). Differentiable.
    """
    m_i = box_mean(guide, radius)
    m_p = box_mean(p, radius)
    cov = box_mean(guide * p, radius) - m_i * m_p
    var = box_mean(guide * guide, radius) - m_i * m_i
    a = cov / (var + eps)
    b = m_p - a * m_i
    return box_mean(a, radius) * guide + box_mean(b, radius)


def guided_denoise(
    x: jnp.ndarray,
    radius: int = 2,
    eps: float = 1e-3,
    strength: float = 1.0,
) -> jnp.ndarray:
    """(..., 3, H, W) RGB denoise: every channel guided by the luminance
    plane (the same luma-joint trick the default bilateral uses —
    chroma smoothing follows luminance edges, no per-channel fringing),
    blended by ``strength`` like ops.denoise.bilateral_denoise."""
    r, g, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    luma = 0.299 * r + 0.587 * g + 0.114 * b
    q = guided_filter(x, luma[..., None, :, :], radius, eps)
    return x + strength * (q - x)
