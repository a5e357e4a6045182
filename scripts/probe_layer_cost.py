#!/usr/bin/env python
"""Isolate the production conv layer cost: conv2d_patch_mxu (with its
halo-build + weight-packing glue) vs XLA conv at identical 32->32
600x400x16 shapes, plus variants that pre-pack weights and skip glue."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from low_light_image_enhancement_tpu.kernels.mxu_conv import (  # noqa: E402
    conv2d_patch_mxu,
)
from low_light_image_enhancement_tpu.models.layers import conv2d  # noqa: E402
from low_light_image_enhancement_tpu.ops.patch_conv import (  # noqa: E402
    pack_patch_weights,
)

B, H2, W2, C = 16, 200, 300, 32
L = 4 * C


def _sync(x):
    _ = float(jnp.asarray(x).reshape(-1)[0])


def _chain(f, x, n_short=10, n_long=40):
    _sync(f(x))

    def chain(n):
        y = x
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(y)
        _sync(y)
        return time.perf_counter() - t0

    chain(n_short)
    chain(n_long)
    vals = []
    for _ in range(3):
        ts, tl = chain(n_short), chain(n_long)
        vals.append((tl - ts) / (n_long - n_short))
    return float(np.median(vals))


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.1, jnp.float32)
    b = jnp.zeros((C,), jnp.float32)
    wp = pack_patch_weights(w)  # pre-packed once (concrete)
    x0 = jnp.asarray(rng.random((B, H2, W2, L)) * 0.1, jnp.bfloat16)
    xn = jnp.asarray(rng.random((B, 2 * H2, 2 * W2, C)) * 0.1, jnp.bfloat16)

    # 1) production layer, weights packed INSIDE jit (as the models do)
    f1 = jax.jit(lambda x: conv2d_patch_mxu(
        x, pack_patch_weights(w), b, act="relu"))
    # 2) production layer, weights pre-packed (packing outside the graph)
    f2 = jax.jit(lambda x: conv2d_patch_mxu(x, wp, b, act="relu"))
    # 3) XLA conv on unpacked layout
    f3 = jax.jit(lambda x: jax.nn.relu(conv2d(x, w, b, jnp.bfloat16)))

    useful = B * 4 * H2 * W2 * 9 * C * C * 2
    for name, f, x in (("pack-in-jit", f1, x0), ("pre-packed", f2, x0),
                       ("xla-conv", f3, xn)):
        dt = _chain(f, x)
        print(f"{name:12s} {dt*1e3:7.2f} ms/layer-batch  "
              f"useful {useful/dt/1e12:6.2f} TF/s", flush=True)


if __name__ == "__main__":
    main()
