"""Temporally-stable video enhancement (config 4's video-frame use case).

Per-frame retinex enhancement flickers when scene illumination estimates
jitter frame to frame. ``VideoEnhancer`` smooths the *illumination map* with
an exponential moving average across frames — structure (reflectance) stays
per-frame sharp while the gain field evolves smoothly, the standard
temporal-consistency trick for Retinex pipelines.

Functional core (``video_step``) is jit-compatible with explicit carry
state; ``VideoEnhancer`` wraps it with a Python-side state holder and the
u8 HWC API. jnp path (no Pallas) — the EMA makes the graph stateful, so it
rides XLA fusion instead of the stateless fused kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.core import MARGIN
from low_light_image_enhancement_tpu.kernels.striping import plan_stripes
from low_light_image_enhancement_tpu.ops.colorspace import (
    normalize_u8,
    quantize_u8,
)
from low_light_image_enhancement_tpu.ops.denoise import bilateral_core
from low_light_image_enhancement_tpu.ops.filters import roll2d, separable_blur
from low_light_image_enhancement_tpu.pipeline import pad_planar

State = Tuple[jnp.ndarray, jnp.ndarray]  # (initialized flag, L_ema)


def _illum(xp: jnp.ndarray, cfg: PipelineConfig) -> jnp.ndarray:
    return separable_blur(jnp.max(xp, axis=-3), cfg.blur_radius,
                          cfg.blur_sigma, roll2d)


def video_step(
    state: State, xp: jnp.ndarray, cfg: PipelineConfig, alpha: float
) -> Tuple[State, jnp.ndarray]:
    """One frame on a padded planar canvas (3, Hp, Wp) f32.

    ``alpha`` is the new-frame weight of the illumination EMA (1.0 = no
    smoothing = the stateless pipeline).
    """
    initialized, l_ema = state
    l_now = _illum(xp, cfg)
    l_mix = jnp.where(initialized, alpha * l_now + (1.0 - alpha) * l_ema,
                      l_now)
    # Reflectance from the PER-FRAME illumination (cancels frame-to-frame
    # flicker in the input), re-lit with the temporally-smoothed EMA
    # illumination: out = (x / L_now) * L_ema**gamma. At alpha=1 this is
    # exactly the stateless x * L**(gamma-1) path.
    l_now_safe = jnp.clip(l_now, cfg.illum_eps, 1.0)
    l_mix_safe = jnp.clip(l_mix, cfg.illum_eps, 1.0)
    boost = jnp.exp(
        cfg.gamma * jnp.log(l_mix_safe) - jnp.log(l_now_safe)
    )
    y = jnp.clip(xp * boost[None], 0.0, 1.0)
    if cfg.denoise_strength > 0.0:
        inv2s2 = 1.0 / (2.0 * cfg.denoise_sigma * cfg.denoise_sigma)
        y = bilateral_core(y, inv2s2, cfg.denoise_strength, roll2d)
    return (jnp.ones_like(initialized), l_mix), jnp.clip(y, 0.0, 1.0)


class VideoEnhancer:
    """Stateful u8 HWC video interface::

        ve = VideoEnhancer(PipelineConfig(), alpha=0.3)
        for frame in frames:            # (H, W, 3) u8, fixed size
            out = ve.process(frame)
        ve.reset()                       # scene cut
    """

    def __init__(self, config: PipelineConfig = PipelineConfig(),
                 alpha: float = 0.3):
        if config.method != "retinex":
            raise NotImplementedError("video path supports method='retinex'")
        self.config = config
        self.alpha = float(alpha)
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
            plan = plan_stripes(h, w, MARGIN, self.config.stripe_rows)
            cfg, alpha, m = self.config, self.alpha, MARGIN

            def step(state, u8):
                xp = pad_planar(
                    jnp.transpose(normalize_u8(u8), (2, 0, 1)), plan, h, w
                )
                state, yp = video_step(state, xp, cfg, alpha)
                out = quantize_u8(yp[:, m : m + h, m : m + w])
                return state, jnp.transpose(out, (1, 2, 0))

            self._plan = plan
            self._step = jax.jit(step)
        elif (h, w) != self._shape:
            raise ValueError(
                f"frame size changed {self._shape} -> {(h, w)}; "
                "create a new VideoEnhancer (or call one per stream)"
            )
        if self._state is None:
            hp, wp = self._plan.padded_h, self._plan.padded_w
            self._state = (jnp.zeros((), bool), jnp.zeros((hp, wp)))
        self._state, out = self._step(self._state, jnp.asarray(frame_u8))
        return np.asarray(out)
