"""Transpose-free fused Retinex kernel on interleaved HWC data.

**Measured outcome (v5e, 600x400 batch 64): bit-exact but ~2.7x SLOWER than
the planar kernel (12.8k vs 35.3k img/s).** The transposes it eliminates
cost ~30% of the planar path, but interleaving makes the illumination +
blur stages run on 3x the lanes (every channel lane instead of one plane)
and adds mod-3 select shuffles — a net loss. Kept as a tested, documented
alternative layout; the pipeline default remains the planar kernel.

Design: the planar kernel (``fused_enhance.py``) needs an HWC->CHW
transpose on the way in and back. This kernel removes both: a u8 HWC image
reshapes (for free — memory is already contiguous) to a 2-D ``(H, W*3)``
interleaved plane, and the whole graph runs on that layout:

  * per-pixel channel max  -> lane-rolls by -1/-2 + max, then a mod-3 mask
    selects each pixel's max into all three of its lanes;
  * Gaussian blur          -> row rolls unchanged, lane rolls scaled by 3;
  * gamma boost            -> pure elementwise (layout-independent);
  * bilateral denoise      -> taps (dy, 3*dx): channels never mix because
    the stride-3 structure is preserved by every shift.

Math (taps, accumulation order, quantization) is identical to the planar
kernel, so outputs are bit-exact across the two layouts.

Lane margin = 3 * MARGIN = 12 lanes; worst-case lane receptive field is
2 (channel max) + 6 (blur radius 2) + 3 (denoise) = 11 < 12, so wrap
corruption never reaches the cropped output (same argument as the planar
stripe design).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.core import MARGIN
from low_light_image_enhancement_tpu.kernels.fused_enhance import kroll2d
from low_light_image_enhancement_tpu.kernels.striping import (
    StripePlan,
    plan_stripes,
)
from low_light_image_enhancement_tpu.ops.denoise import bilateral_core
from low_light_image_enhancement_tpu.ops.filters import separable_blur


def pad_hwc(imgs_u8: jnp.ndarray, plan: StripePlan, h: int, w: int):
    """(B, H, W, 3) u8 -> edge-padded (B, Hp, Wp, 3) (margin rows/cols before
    the image origin, alignment padding after)."""
    m = plan.margin
    return jnp.pad(
        imgs_u8,
        ((0, 0), (m, plan.padded_h - h - m), (m, plan.padded_w - w - m),
         (0, 0)),
        mode="edge",
    )


def _shift_interleaved(x, dy, dx):
    return kroll2d(x, dy, 3 * dx)


def _retinex_hwc_kernel(
    x_ref, o_ref, *, radius, sigma, gamma, eps, inv2s2, strength, margin,
    th, dn_kind="exp"
):
    raw = x_ref[0, 0]  # (THh, 3*Wp) u8 interleaved
    x = raw.astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)

    # channel max at each pixel, broadcast back to that pixel's three lanes
    s1 = kroll2d(x, 0, -1)
    s2 = kroll2d(x, 0, -2)
    m3 = jnp.maximum(jnp.maximum(x, s1), s2)  # pixel max at lanes % 3 == 0
    lane_mod = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 3
    l0 = jnp.where(
        lane_mod == 0, m3,
        jnp.where(lane_mod == 1, kroll2d(m3, 0, 1), kroll2d(m3, 0, 2)),
    )

    # same blur as everywhere else, with lane shifts x3 (interleaved layout)
    l = jnp.clip(
        separable_blur(l0, radius, sigma, _shift_interleaved), eps, 1.0
    )
    boost = jnp.exp((gamma - 1.0) * jnp.log(l))
    y = jnp.clip(x * boost, 0.0, 1.0)
    if strength > 0.0:
        y = bilateral_core(y, inv2s2, strength, _shift_interleaved, dn_kind)
    y = jnp.clip(y, 0.0, 1.0)[margin : margin + th, :]
    o_ref[0, 0] = jnp.clip(jnp.round(y * 255.0), 0.0, 255.0).astype(
        jnp.int32
    ).astype(jnp.uint8)


def fused_retinex_hwc(
    padded_u8: jnp.ndarray,
    cfg: PipelineConfig,
    plan: StripePlan,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, Hp, Wp, 3) u8 edge-padded HWC -> (B, S*TH, Wp, 3) u8 enhanced
    (row 0 = original row 0; caller crops rows [0, H) and cols
    [margin, margin + W))."""
    if cfg.denoise_strength > 0.0 and (
        cfg.denoise_guide != "perchannel" or cfg.denoise_taps != "full"
    ):
        raise NotImplementedError(
            "the interleaved-HWC experiment implements only the per-channel "
            "full-tap bilateral; the production planar kernel supports "
            "denoise_guide='luma' and denoise_taps='sep'"
        )
    b, hp, wp, _ = padded_u8.shape
    lanes = 3 * wp
    thh = plan.stripe_rows + 2 * plan.margin
    flat = padded_u8.reshape(b, hp, lanes)  # free: memory already interleaved
    stripes = jnp.stack(
        [
            lax.slice_in_dim(flat, i * plan.stripe_rows,
                             i * plan.stripe_rows + thh, axis=1)
            for i in range(plan.n_stripes)
        ],
        axis=1,
    )  # (B, S, THh, 3*Wp)

    kernel = functools.partial(
        _retinex_hwc_kernel,
        radius=cfg.blur_radius,
        sigma=cfg.blur_sigma,
        gamma=cfg.gamma,
        eps=cfg.illum_eps,
        inv2s2=1.0 / (2.0 * cfg.denoise_sigma * cfg.denoise_sigma),
        strength=cfg.denoise_strength,
        dn_kind=cfg.denoise_kernel,
        margin=plan.margin,
        th=plan.stripe_rows,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, plan.n_stripes),
        in_specs=[
            pl.BlockSpec(
                (1, 1, thh, lanes),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, plan.stripe_rows, lanes),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, plan.n_stripes, plan.stripe_rows, lanes), jnp.uint8
        ),
        interpret=interpret,
    )(stripes)
    return out.reshape(b, plan.n_stripes * plan.stripe_rows, wp, 3)


# The interleaved kernel holds ~7 live f32 planes of (THh, 3*Wp) during the
# bilateral stage (x, l/boost, y, acc, wacc, tap temp, quantize temp); cap
# stripe rows so that stays under ~13 MB of the 16 MB VMEM (measured: 408
# rows x 1920 lanes -> 20.4 MB scoped, OOM).
_LIVE_F32_PLANES = 7
_HWC_VMEM_TARGET = 13 * 1024 * 1024


def _hwc_row_cap(w: int) -> int:
    wp = -(-(w + 2 * MARGIN) // 128) * 128
    thh_cap = _HWC_VMEM_TARGET // (_LIVE_F32_PLANES * 3 * wp * 4)
    return max(8, ((thh_cap - 2 * MARGIN) // 8) * 8)


def enhance_hwc_u8(
    imgs_u8: jnp.ndarray, cfg: PipelineConfig, interpret: bool = False
) -> jnp.ndarray:
    """End-to-end (B, H, W, 3) u8 -> (B, H, W, 3) u8 via the interleaved
    kernel: one edge-pad copy in, one crop copy out, zero transposes."""
    _, h, w, _ = imgs_u8.shape
    plan = plan_stripes(h, w, MARGIN,
                        min(cfg.stripe_rows, _hwc_row_cap(w)))
    padded = pad_hwc(imgs_u8, plan, h, w)
    out = fused_retinex_hwc(padded, cfg, plan, interpret=interpret)
    m = plan.margin
    return out[:, :h, m : m + w, :]
