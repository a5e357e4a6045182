"""Iterative light-enhancement curves (Zero-DCE family).

Each iteration applies the quadratic curve ``x <- x + a * x * (1 - x)`` with a
per-pixel, per-channel, per-iteration parameter map ``a`` in [-1, 1], which is
a fixed point at 0 and 1 and monotone on [0,1] — so it brightens without
clipping. Spec: BASELINE.json config 3 ("Zero-DCE-style curve-estimation
CNN"); cf. fast FCN image operators (PAPERS.md:8).
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_curves(x: jnp.ndarray, curve_params: jnp.ndarray) -> jnp.ndarray:
    """Apply ``n_iter`` LE-curve iterations.

    Args:
      x: planar image ``(..., 3, H, W)`` in [0, 1].
      curve_params: ``(..., n_iter, 3, H, W)`` curve maps in [-1, 1].
    """
    n_iter = curve_params.shape[-4]
    for i in range(n_iter):  # static unroll — n_iter is a config constant
        a = curve_params[..., i, :, :, :]
        x = x + a * x * (1.0 - x)
    return x
