"""Gamma / tone-curve correction (BASELINE.json north_star: "fused ... gamma
correction")."""

from __future__ import annotations

import jax.numpy as jnp


def gamma_correct(x: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """x**gamma on [0,1] with a safe clip; gamma < 1 brightens."""
    return jnp.power(jnp.clip(x, 0.0, 1.0), gamma)
