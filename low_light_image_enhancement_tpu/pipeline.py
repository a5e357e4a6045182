"""Pipeline assembly: the public ``enhance`` API over the compiled graph.

Responsibilities (SURVEY.md L3): layout conversion at the API boundary
(u8 HWC <-> planar f32), hardware-aligned edge padding, jit-cache discipline
(one compile per (batch, H, W, config) bucket), and dispatch between the
fused Pallas path (TPU) and the pure-jnp reference path (any backend).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.core import MARGIN, enhance_core_padded
from low_light_image_enhancement_tpu.kernels.fused_enhance import fused_retinex
from low_light_image_enhancement_tpu.kernels.striping import (
    StripePlan,
    plan_stripes,
)
from low_light_image_enhancement_tpu.kernels.tiled_denoise import tiled_denoise
from low_light_image_enhancement_tpu.models.curve_cnn import (
    apply_curve_cnn,
    init_curve_cnn,
)
from low_light_image_enhancement_tpu.ops.colorspace import (
    normalize_u8,
    quantize_u8,
)


def pad_planar(x: jnp.ndarray, plan: StripePlan, h: int, w: int) -> jnp.ndarray:
    """Edge-replicate pad (..., C, H, W) to the plan's aligned canvas, with
    exactly ``margin`` rows/cols before the image origin."""
    m = plan.margin
    pad = [(0, 0)] * (x.ndim - 2) + [
        (m, plan.padded_h - h - m),
        (m, plan.padded_w - w - m),
    ]
    return jnp.pad(x, pad, mode="edge")


def _enhance_u8_batch(
    imgs_u8: jnp.ndarray,
    curve_params: Optional[Dict[str, Any]],
    *,
    cfg: PipelineConfig,
    plan: StripePlan,
    use_pallas: bool,
    pallas_interpret: bool,
) -> jnp.ndarray:
    """Traced body: (B, H, W, 3) u8 -> (B, H, W, 3) u8 enhanced."""
    _, h, w, _ = imgs_u8.shape
    m = plan.margin

    if use_pallas and cfg.method == "retinex":
        # u8 end-to-end fast path: pad/stripe in u8, normalize + quantize
        # inside the fused kernel -> ~5x less HBM traffic than f32 staging.
        xpu = pad_planar(jnp.transpose(imgs_u8, (0, 3, 1, 2)), plan, h, w)
        canvas = fused_retinex(xpu, cfg, plan, interpret=pallas_interpret)
        return jnp.transpose(canvas[:, :, :h, m : m + w], (0, 2, 3, 1))

    x = jnp.transpose(normalize_u8(imgs_u8), (0, 3, 1, 2))  # planar f32
    xp = pad_planar(x, plan, h, w)

    curve_maps = None
    if cfg.method in ("curve", "hybrid"):
        # Zero-DCE convention: curves are estimated from the raw input.
        curve_maps = apply_curve_cnn(
            curve_params, xp, n_iter=cfg.curve_iters,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
        )

    if use_pallas and cfg.denoise_strength > 0.0:
        yp = enhance_core_padded(xp, cfg, curve_maps, do_denoise=False)
        canvas = tiled_denoise(
            yp, cfg.denoise_sigma, cfg.denoise_strength, plan,
            interpret=pallas_interpret,
        )
        y = canvas[:, :, :h, m : m + w]
    else:
        yp = enhance_core_padded(xp, cfg, curve_maps)
        y = yp[:, :, m : m + h, m : m + w]

    return jnp.transpose(quantize_u8(y), (0, 2, 3, 1))


class EnhancePipeline:
    """Compiled low-light enhancement pipeline.

    Example::

        pipe = EnhancePipeline(PipelineConfig(gamma=0.5))
        out = pipe.enhance(img_u8_hwc)
    """

    def __init__(
        self,
        config: PipelineConfig = PipelineConfig(),
        curve_params: Optional[Dict[str, Any]] = None,
        rng_seed: int = 0,
        force_jnp: bool = False,
        pallas_interpret: bool = False,
    ):
        self.config = config
        if config.method in ("curve", "hybrid") and curve_params is None:
            curve_params = init_curve_cnn(
                jax.random.PRNGKey(rng_seed),
                features=config.curve_features,
                n_iter=config.curve_iters,
            )
        self.curve_params = curve_params
        backend = jax.default_backend()
        self._use_pallas = config.use_pallas and not force_jnp and (
            backend == "tpu" or pallas_interpret
        )
        self._pallas_interpret = pallas_interpret and backend != "tpu"
        self._cache: Dict[Tuple[int, int, int], Any] = {}

    # ------------------------------------------------------------------ #

    def _compiled(self, b: int, h: int, w: int):
        key = (b, h, w)
        fn = self._cache.get(key)
        if fn is None:
            plan = plan_stripes(h, w, MARGIN, self.config.stripe_rows)
            fn = jax.jit(
                functools.partial(
                    _enhance_u8_batch,
                    cfg=self.config,
                    plan=plan,
                    use_pallas=self._use_pallas,
                    pallas_interpret=self._pallas_interpret,
                )
            )
            self._cache[key] = fn
        return fn

    def enhance_batch_device(self, imgs_u8) -> jnp.ndarray:
        """(B, H, W, 3) u8 -> enhanced u8, left on device (no host sync)."""
        b, h, w, c = imgs_u8.shape
        if c != 3:
            raise ValueError(f"expected RGB (B,H,W,3), got {imgs_u8.shape}")
        return self._compiled(b, h, w)(imgs_u8, self.curve_params)

    def enhance_batch(self, imgs_u8) -> np.ndarray:
        """(B, H, W, 3) u8 -> (B, H, W, 3) u8 enhanced (host numpy)."""
        return np.asarray(self.enhance_batch_device(jnp.asarray(imgs_u8)))

    def enhance(self, img_u8) -> np.ndarray:
        """(H, W, 3) u8 -> (H, W, 3) u8 enhanced."""
        img_u8 = np.asarray(img_u8)
        if img_u8.ndim != 3 or img_u8.shape[-1] != 3:
            raise ValueError(f"expected RGB (H,W,3), got {img_u8.shape}")
        return self.enhance_batch(img_u8[None])[0]

    __call__ = enhance

    def enhance_file(self, in_path: str, out_path: str) -> None:
        from low_light_image_enhancement_tpu.io.codec import (
            decode_image,
            encode_image,
        )

        encode_image(self.enhance(decode_image(in_path)), out_path)


# ---------------------------------------------------------------------- #
# Module-level convenience API (BASELINE.json: "enhance(image)->image")
# ---------------------------------------------------------------------- #

_default_pipeline: Optional[EnhancePipeline] = None


def _default() -> EnhancePipeline:
    global _default_pipeline
    if _default_pipeline is None:
        _default_pipeline = EnhancePipeline()
    return _default_pipeline


def enhance(img_u8) -> np.ndarray:
    """Enhance a single u8 HWC RGB image with the default config."""
    return _default().enhance(img_u8)


def enhance_batch(imgs_u8) -> np.ndarray:
    """Enhance a u8 BHWC RGB batch with the default config."""
    return _default().enhance_batch(imgs_u8)
