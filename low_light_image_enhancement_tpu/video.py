"""Temporally-stable video enhancement (config 4's video-frame use case).

Per-frame enhancement flickers when the per-frame estimates jitter. For each
method the natural temporal carry is smoothed with an exponential moving
average across frames:

  * retinex / hybrid — the *illumination map*: structure (reflectance) stays
    per-frame sharp while the gain field evolves smoothly, the standard
    temporal-consistency trick for Retinex pipelines.
  * curve — the *LE-curve parameter maps* from the Zero-DCE estimator: the
    per-pixel adjustment curves evolve smoothly while each frame is curved
    individually.
  * fcn / decom — no low-dimensional carry exists (the net's output IS the
    frame); use ``EnhancePipeline.enhance_stream`` for those.

Functional core (``video_step``) is jit-compatible with explicit carry state
and runs on the same halo'd row block as ``blocks.enhance_learned_block``;
``VideoEnhancer`` wraps it with a Python-side state holder and the u8 HWC
API. jnp path (no Pallas) — the EMA makes the graph stateful, so it rides
XLA fusion instead of the stateless fused kernel.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.blocks import (
    _curve_maps,
    _mask_extent,
    block_geometry,
    enhance_learned_block,
    learned_halo,
)
from low_light_image_enhancement_tpu.config import MARGIN, PipelineConfig
from low_light_image_enhancement_tpu.ops.colorspace import (
    normalize_u8,
    quantize_u8,
)
from low_light_image_enhancement_tpu.ops.curves import apply_curves
from low_light_image_enhancement_tpu.ops.denoise import denoise_planar
from low_light_image_enhancement_tpu.ops.filters import roll2d, separable_blur

State = Tuple[jnp.ndarray, jnp.ndarray]  # (initialized flag, EMA carry)

_VIDEO_METHODS = ("retinex", "hybrid", "curve")


def _illum(xb: jnp.ndarray, cfg: PipelineConfig) -> jnp.ndarray:
    return separable_blur(jnp.max(xb, axis=-3), cfg.blur_radius,
                          cfg.blur_sigma, roll2d)


def _denoise_tail(y: jnp.ndarray, cfg: PipelineConfig) -> jnp.ndarray:
    if cfg.denoise_strength > 0.0:
        inv2s2 = 1.0 / (2.0 * cfg.denoise_sigma * cfg.denoise_sigma)
        y = denoise_planar(y, inv2s2, cfg.denoise_strength, roll2d,
                           cfg.denoise_kernel, cfg.denoise_guide,
                           cfg.denoise_taps)
    return jnp.clip(y, 0.0, 1.0)


def video_step(
    state: State,
    xb: jnp.ndarray,
    cfg: PipelineConfig,
    alpha: float,
    model_params: Optional[Dict[str, Any]] = None,
    h: Optional[int] = None,
    w: Optional[int] = None,
) -> Tuple[State, jnp.ndarray]:
    """One frame on a halo'd block (3, HB, WB) f32 (blocks.py layout).

    ``alpha`` is the new-frame weight of the EMA (1.0 = no smoothing = the
    stateless pipeline). Returns the enhanced interior rows
    (3, HB - 2*halo, WB); columns are cropped by the caller.
    """
    initialized, carry = state
    halo = learned_halo(cfg)
    rows = xb.shape[-2] - 2 * halo
    if h is None:
        h = rows
    if w is None:
        w = xb.shape[-1] - 2 * MARGIN

    if cfg.method in ("retinex", "hybrid"):
        l_now = _illum(xb, cfg)
        l_mix = jnp.where(initialized, alpha * l_now + (1.0 - alpha) * carry,
                          l_now)
        # Reflectance from the PER-FRAME illumination (cancels frame-to-frame
        # flicker in the input), re-lit with the temporally-smoothed EMA
        # illumination: out = (x / L_now) * L_ema**gamma. At alpha=1 this is
        # exactly the stateless x * L**(gamma-1) path.
        l_now_safe = jnp.clip(l_now, cfg.illum_eps, 1.0)
        l_mix_safe = jnp.clip(l_mix, cfg.illum_eps, 1.0)
        boost = jnp.exp(cfg.gamma * jnp.log(l_mix_safe) - jnp.log(l_now_safe))
        y = jnp.clip(xb * boost[..., None, :, :], 0.0, 1.0)
        if cfg.method == "hybrid":
            out = enhance_learned_block(
                xb, cfg, model_params, row0=-halo, h=h, w=w, pre_boosted=y
            )
            return (jnp.ones_like(initialized), l_mix), out
        y = _denoise_tail(y, cfg)
        return (jnp.ones_like(initialized), l_mix), \
            y[..., halo : halo + rows, :]

    if cfg.method == "curve":
        cnn_in = _mask_extent(xb, -halo, h, w)
        maps_now = _curve_maps(cnn_in, cfg, model_params)
        maps = jnp.where(initialized,
                         alpha * maps_now + (1.0 - alpha) * carry, maps_now)
        y = jnp.clip(apply_curves(xb, maps), 0.0, 1.0)
        y = _denoise_tail(y, cfg)
        return (jnp.ones_like(initialized), maps), \
            y[..., halo : halo + rows, :]

    raise ValueError(
        f"video path supports methods {_VIDEO_METHODS} (no temporal carry "
        f"exists for {cfg.method!r}; use EnhancePipeline.enhance_stream)"
    )


class VideoEnhancer:
    """Stateful u8 HWC video interface::

        ve = VideoEnhancer(PipelineConfig(), alpha=0.3)
        for frame in frames:            # (H, W, 3) u8, fixed size
            out = ve.process(frame)
        ve.reset()                       # scene cut
    """

    def __init__(self, config: PipelineConfig = PipelineConfig(),
                 alpha: float = 0.3,
                 model_params: Optional[Dict[str, Any]] = None):
        if config.method not in _VIDEO_METHODS:
            raise ValueError(
                f"video path supports methods {_VIDEO_METHODS}, got "
                f"{config.method!r}; use EnhancePipeline.enhance_stream for "
                "per-frame fcn/decom"
            )
        self.config = config
        self.alpha = float(alpha)
        if model_params is None and config.method != "retinex":
            from low_light_image_enhancement_tpu.pipeline import (
                EnhancePipeline,
            )

            model_params = EnhancePipeline._default_params(config, 0)
        self.model_params = model_params
        self._state: Optional[State] = None
        self._step = None
        self._shape: Optional[Tuple[int, int]] = None

    def reset(self) -> None:
        self._state = None

    def process(self, frame_u8: np.ndarray) -> np.ndarray:
        frame_u8 = np.asarray(frame_u8)
        h, w, c = frame_u8.shape
        if self._shape is None:
            self._shape = (h, w)
            cfg, alpha, m = self.config, self.alpha, MARGIN
            halo = learned_halo(cfg)
            h_core, wp = block_geometry(cfg, h, w)
            params = self.model_params

            def step(state, u8):
                x = jnp.transpose(normalize_u8(u8), (2, 0, 1))
                xb = jnp.pad(
                    x, ((0, 0), (halo, halo + h_core - h), (m, wp - w - m)),
                    mode="edge",
                )
                state, yb = video_step(state, xb, cfg, alpha, params, h, w)
                out = quantize_u8(yb[:, :h, m : m + w])
                return state, jnp.transpose(out, (1, 2, 0))

            self._carry_shape = (
                (cfg.curve_iters, 3, h_core + 2 * halo, wp)
                if cfg.method == "curve"
                else (h_core + 2 * halo, wp)
            )
            self._step = jax.jit(step)
        elif (h, w) != self._shape:
            raise ValueError(
                f"frame size changed {self._shape} -> {(h, w)}; "
                "create a new VideoEnhancer (or call one per stream)"
            )
        if self._state is None:
            self._state = (jnp.zeros((), bool),
                           jnp.zeros(self._carry_shape))
        self._state, out = self._step(self._state, jnp.asarray(frame_u8))
        return np.asarray(out)
