"""Device-side synthetic low-light pair generation (jit-compatible).

Same construction as ``data.synth`` (smooth random color field + texture,
smooth illumination, sensor noise) but built from ``jax.random`` inside jit,
so training loops can generate batches ON the TPU — zero host->device
transfer per step. Essential here (the chip is behind a slow tunnel) and
generally the cheapest way to keep a fast chip fed with synthetic data.

Not bit-identical to the numpy generator (different RNG); statistically the
same distribution.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _smooth_field(key: jax.Array, b: int, h: int, w: int, c: int,
                  grid: int) -> jnp.ndarray:
    coarse = jax.random.uniform(key, (b, grid, grid, c))
    return jax.image.resize(coarse, (b, h, w, c), method="bilinear")


def synth_pair_batch(
    key: jax.Array, batch: int, h: int, w: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (low, high) planar f32 (batch, 3, h, w) in [0, 1]."""
    k_base, k_tex, k_illum, k_noise = jax.random.split(key, 4)
    base = _smooth_field(k_base, batch, h, w, 3, grid=6)
    texture = _smooth_field(k_tex, batch, h, w, 3, grid=24) - 0.5
    gt = jnp.clip(0.15 + 0.75 * base + 0.25 * texture, 0.02, 0.98)

    illum = 0.05 + 0.30 * _smooth_field(k_illum, batch, h, w, 1, grid=4)
    noise = 0.01 * jax.random.normal(k_noise, (batch, h, w, 3))
    low = jnp.clip(gt * illum + noise, 0.0, 1.0)

    to_planar = lambda x: jnp.transpose(x, (0, 3, 1, 2))
    return to_planar(low), to_planar(gt)


def synth_batch_iter(batch: int, h: int, w: int, seed: int = 0):
    """Infinite iterator of device-resident (low, high) batches; the
    generation is jitted and fused with nothing else (callers fold it into
    their own jit by using ``synth_pair_batch`` directly if they want)."""
    gen = jax.jit(lambda k: synth_pair_batch(k, batch, h, w),
                  static_argnums=())
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield gen(sub)
