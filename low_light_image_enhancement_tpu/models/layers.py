"""Shared conv primitive for all model families.

NHWC 3x3 (optionally dilated) conv in a uniform compute dtype — uniform
dtypes keep the conv VJP well-typed on jax 0.9, and the MXU accumulates
bf16 products in f32 natively.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_CONV_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b, compute_dtype, dilation: int = 1):
    y = lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(1, 1),
        padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_CONV_DN,
    )
    return y + b.astype(compute_dtype)
