#!/usr/bin/env python
"""Micro-probe: achievable MXU rate at patch-GEMM shapes (design probe for
kernels/mxu_conv.py — VERDICT r2 item 1).

Three kernels over a (n_stripes, R, W2, L) bf16 input:
  matmul : per stripe, reshape (R*W2, L) @ (L, N) — pure MXU ceiling.
  slab   : + build a K=4L im2col buffer from 16 lane-block shifted copies
           (the patch-GEMM gather) then (R*W2, 4L) @ (4L, N).
  chunked: slab built/consumed in 128-lane K-chunks with f32 accumulation.

Reports TFLOP/s (useful, not counting structural zeros) for each.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

R, W2, CIN, COUT = 16, 304, 32, 32
L = 4 * CIN          # 128 packed lanes
N = 4 * COUT         # 128
NSTRIPES = 12
M = R * W2


def _sync(x):
    _ = float(jnp.asarray(x).reshape(-1)[0])


def _time(f, *args, n_short=20, n_long=100):
    """Chained steady-state timing: x feeds back, marginal rate between a
    short and a long chain (same methodology as bench.py — dispatch and
    sync latency cancel)."""
    x = args[0]
    rest = args[1:]
    _sync(f(x, *rest))

    def chain(n):
        y = x
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(y, *rest)
        _sync(y)
        return time.perf_counter() - t0

    chain(n_short); chain(n_long)  # warmup
    vals = []
    for _ in range(3):
        ts, tl = chain(n_short), chain(n_long)
        vals.append((tl - ts) / (n_long - n_short))
    return float(np.median(vals))


def k_matmul(x_ref, w_ref, o_ref):
    x = x_ref[0].reshape(M, L)
    o_ref[0] = jnp.dot(
        x, w_ref[:], preferred_element_type=jnp.float32
    ).reshape(R, W2, N).astype(jnp.bfloat16)


def k_slab(x_ref, w_ref, o_ref, s_ref):
    # 16 shifted lane-block copies (4 oy x 4 ox), phases faked as lane
    # blocks; all shifts are STATIC slices (pltpu.roll on 3D vectors does
    # not lower in this toolchain).
    for i, oy in enumerate((-1, 0, 1, 2)):
        for j, ox in enumerate((-1, 0, 1, 2)):
            p = ((oy % 2) * 2 + (ox % 2)) * CIN
            k0 = (i * 4 + j) * CIN
            lo, hi = max(0, -ox), W2 - max(0, ox)
            s_ref[:, lo:hi, k0 : k0 + CIN] = (
                x_ref[0, :, lo + ox : hi + ox, p : p + CIN])
    s = s_ref[:].reshape(M, 4 * L)
    o_ref[0] = jnp.dot(
        s, w_ref[:], preferred_element_type=jnp.float32
    ).reshape(R, W2, N).astype(jnp.bfloat16)


def k_chunked(x_ref, w_ref, o_ref, s_ref, acc_ref):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for c, oy in enumerate((-1, 0, 1, 2)):  # one 128-K chunk per oy
        for j, ox in enumerate((-1, 0, 1, 2)):
            p = ((oy % 2) * 2 + (ox % 2)) * CIN
            lo, hi = max(0, -ox), W2 - max(0, ox)
            s_ref[:, lo:hi, j * CIN : (j + 1) * CIN] = (
                x_ref[0, :, lo + ox : hi + ox, p : p + CIN])
        acc_ref[:] += jnp.dot(
            s_ref[:].reshape(M, L),
            w_ref[c * L : (c + 1) * L, :],
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc_ref[:].reshape(R, W2, N).astype(jnp.bfloat16)


def run(name, kernel, kw, wshape):
    x = jnp.asarray(
        np.random.default_rng(0).random((NSTRIPES, R, W2, L)), jnp.bfloat16
    )
    w = jnp.asarray(
        np.random.default_rng(1).random(wshape) * 0.1, jnp.bfloat16
    )
    fn = pl.pallas_call(
        kernel,
        grid=(NSTRIPES,),
        in_specs=[
            pl.BlockSpec((1, R, W2, L), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wshape, lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W2, N), lambda s: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSTRIPES, R, W2, N), jnp.bfloat16),
        **kw,
    )
    f = jax.jit(fn)
    dt = _time(f, x, w)
    # useful FLOPs: each output uses 9*CIN*COUT MACs per pixel (conv math)
    useful = NSTRIPES * M * 9 * CIN * COUT * 2
    dense = NSTRIPES * M * wshape[0] * wshape[1] * 2
    print(f"{name:8s} {dt*1e6:8.1f} us  dense {dense/dt/1e12:6.2f} TF/s  "
          f"useful {useful/dt/1e12:6.2f} TF/s")


if __name__ == "__main__":
    print(f"stripes={NSTRIPES} R={R} W2={W2} L={L} N={N}")
    run("matmul", k_matmul, {}, (L, N))  # HBM-bound at K=128; context only
    run("slab", k_slab,
        dict(scratch_shapes=[pltpu.VMEM((R, W2, 4 * L), jnp.bfloat16)]),
        (4 * L, N))
    run("chunked", k_chunked,
        dict(scratch_shapes=[pltpu.VMEM((R, W2, L), jnp.bfloat16),
                             pltpu.VMEM((M, N), jnp.float32)]),
        (4 * L, N))
