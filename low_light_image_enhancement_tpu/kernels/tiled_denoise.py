"""Standalone tiled bilateral-denoise Pallas kernel.

Used by the curve-CNN path (where the curve application happens in XLA but
the windowed denoise still benefits from VMEM-resident fusion) and by the
per-shard denoise of the spatially-sharded 4K pipeline (BASELINE.json:11).
Math mirrors ``ops.denoise.bilateral_core`` tap-for-tap.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from low_light_image_enhancement_tpu.kernels.striping import (
    StripePlan,
    extract_stripes,
    merge_stripes,
    stripe_pallas_call,
    stripe_pallas_call_windowed,
    use_windowed,
)
from low_light_image_enhancement_tpu.kernels.fused_enhance import kroll2d
from low_light_image_enhancement_tpu.ops.denoise import plane_cores


def _denoise_kernel(x_ref, o_ref, *, inv2s2, strength, margin, th,
                    dn_kind="exp", guide="perchannel", taps="full",
                    g_radius=2, g_eps=3e-3):
    x = x_ref[0, 0]  # (3, THh, Wp)
    core1, corej = plane_cores(guide, taps, g_radius, g_eps)
    if guide == "luma":
        ys = corej([x[0], x[1], x[2]], inv2s2, strength, kroll2d, dn_kind)
        for c in range(3):
            o_ref[0, 0, c] = jnp.clip(ys[c], 0.0, 1.0)[margin : margin + th, :]
        return
    for c in range(3):
        y = core1(x[c], inv2s2, strength, kroll2d, dn_kind)
        o_ref[0, 0, c] = jnp.clip(y, 0.0, 1.0)[margin : margin + th, :]


def tiled_denoise(
    xp: jnp.ndarray,
    sigma_range: float,
    strength: float,
    plan: StripePlan,
    interpret: bool = False,
    kind: str = "exp",
    guide: str = "perchannel",
    taps: str = "full",
    guided_radius: int = 2,
    guided_eps: float = 3e-3,
    windowed=None,
) -> jnp.ndarray:
    """(B, 3, Hp, Wp) padded canvas -> (B, 3, S*TH, Wp) denoised rows
    [margin, margin + S*TH); caller crops columns. ``windowed`` takes the
    element-offset window path (no XLA extract/merge copies — round 5);
    None = the width-based auto policy (striping.use_windowed)."""
    windowed = use_windowed(windowed, plan)
    if not windowed:
        stripes = jnp.transpose(extract_stripes(xp, plan), (0, 2, 1, 3, 4))

    kernel = functools.partial(
        _denoise_kernel,
        inv2s2=1.0 / (2.0 * sigma_range * sigma_range),
        dn_kind=kind,
        guide=guide,
        taps=taps,
        g_radius=guided_radius,
        g_eps=guided_eps,
        strength=strength,
        margin=plan.margin,
        th=plan.stripe_rows,
    )
    if windowed:
        return stripe_pallas_call_windowed(kernel, xp, plan, jnp.float32,
                                           interpret=interpret)
    out = stripe_pallas_call(kernel, stripes, plan, jnp.float32,
                             interpret=interpret)
    return merge_stripes(out, plan)
