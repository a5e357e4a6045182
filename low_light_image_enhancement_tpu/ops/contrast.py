"""Classical global contrast ops: percentile autocontrast and histogram
equalization — the no-weights baselines every low-light toolkit carries.

Both are jit-compatible (static-shape scatter-add histograms) and operate on
planar images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def autocontrast(
    x: jnp.ndarray, low_pct: float = 1.0, high_pct: float = 99.0,
    per_channel: bool = False,
) -> jnp.ndarray:
    """Percentile stretch to [0, 1] over the last two axes (or per channel
    over the last three when ``per_channel``)."""
    axes = (-2, -1) if per_channel else (-3, -2, -1)
    lo = jnp.percentile(x, low_pct, axis=axes, keepdims=True)
    hi = jnp.percentile(x, high_pct, axis=axes, keepdims=True)
    return jnp.clip((x - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)


def equalize_hist(x: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Global histogram equalization over the last two axes of a plane
    (..., H, W) in [0, 1], via the empirical CDF. Leading axes (batch,
    channel) are equalized independently."""
    shape = x.shape
    flat = x.reshape(-1, shape[-2] * shape[-1])

    def eq_plane(plane):
        idx = jnp.clip((plane * (bins - 1)).astype(jnp.int32), 0, bins - 1)
        hist = jnp.zeros(bins, plane.dtype).at[idx].add(1.0)
        cdf = jnp.cumsum(hist)
        cdf = cdf / cdf[-1]
        return cdf[idx]

    return jax.vmap(eq_plane)(flat).reshape(shape)
