"""Fused Retinex-enhance Pallas kernel (the config-2 hot path).

One grid step = one VMEM-resident image stripe. Inside the kernel:
u8 -> f32 normalization -> max-RGB illumination -> separable Gaussian blur ->
clip -> gamma boost (algebraic form ``x * L**(gamma-1)``) -> 3x3 bilateral
denoise -> clip -> u8 quantization. A single HBM read + write per stripe —
in u8, so the whole pipeline moves ~1.4 MB/image of HBM traffic instead of
the ~28 MB a staged f32 graph would; every intermediate lives in
VMEM/registers. Math mirrors ``core.enhance_core_padded`` +
``ops.colorspace.quantize_u8`` tap-for-tap.

Spec: BASELINE.json north_star ("all per-pixel transforms ... fuse into
Pallas kernels"), target >=1000 600x400 img/s/chip.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.kernels.striping import (
    StripePlan,
    extract_stripes,
    merge_stripes,
    stripe_pallas_call,
)
from low_light_image_enhancement_tpu.ops.denoise import bilateral_core
from low_light_image_enhancement_tpu.ops.filters import separable_blur


def kroll2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """In-kernel circular shift matching ``ops.filters.roll2d`` semantics
    (out[y, x] = in[y - dy, x - dx])."""
    if dy:
        x = pltpu.roll(x, dy % x.shape[-2], axis=x.ndim - 2)
    if dx:
        x = pltpu.roll(x, dx % x.shape[-1], axis=x.ndim - 1)
    return x


def _retinex_kernel(
    x_ref, o_ref, *, radius, sigma, gamma, eps, inv2s2, strength, margin, th,
    u8_io,
):
    raw = x_ref[0, 0]  # (3, THh, Wp)
    if u8_io:
        # Mosaic has no direct u8<->f32 cast; bridge through int32.
        x = raw.astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    else:
        x = raw
    l0 = jnp.maximum(jnp.maximum(x[0], x[1]), x[2])
    l = jnp.clip(separable_blur(l0, radius, sigma, kroll2d), eps, 1.0)
    boost = jnp.exp((gamma - 1.0) * jnp.log(l))
    for c in range(3):  # per-plane 2-D ops keep Mosaic layouts simple
        y = jnp.clip(x[c] * boost, 0.0, 1.0)
        if strength > 0.0:
            y = bilateral_core(y, inv2s2, strength, kroll2d)
        y = jnp.clip(y, 0.0, 1.0)[margin : margin + th, :]
        if u8_io:
            y = jnp.clip(jnp.round(y * 255.0), 0.0, 255.0)
            y = y.astype(jnp.int32).astype(jnp.uint8)
        o_ref[0, 0, c] = y


def fused_retinex(
    xp: jnp.ndarray,
    cfg: PipelineConfig,
    plan: StripePlan,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused kernel over a padded planar batch.

    Args:
      xp: (B, 3, Hp, Wp) padded canvas (see ``pipeline.pad_planar``). dtype
        uint8 (values 0..255, the fast path — conversion happens in-kernel)
        or float32 in [0, 1]; the output dtype matches.
      plan: stripe plan for (Hp, Wp).
      interpret: run in Pallas interpreter mode (CPU tests).

    Returns:
      (B, 3, S*TH, Wp) — padded rows [margin, margin + S*TH), so row 0 of
      the result is row 0 of the original unpadded image. Columns still carry
      the horizontal padding; the caller crops [margin, margin + W).
    """
    u8_io = xp.dtype == jnp.uint8
    stripes = extract_stripes(xp, plan)  # (B, 3, S, THh, Wp)
    stripes = jnp.transpose(stripes, (0, 2, 1, 3, 4))  # (B, S, 3, THh, Wp)

    kernel = functools.partial(
        _retinex_kernel,
        radius=cfg.blur_radius,
        sigma=cfg.blur_sigma,
        gamma=cfg.gamma,
        eps=cfg.illum_eps,
        inv2s2=1.0 / (2.0 * cfg.denoise_sigma * cfg.denoise_sigma),
        strength=cfg.denoise_strength,
        margin=plan.margin,
        th=plan.stripe_rows,
        u8_io=u8_io,
    )
    out = stripe_pallas_call(kernel, stripes, plan, xp.dtype,
                             interpret=interpret)
    return merge_stripes(out, plan)
