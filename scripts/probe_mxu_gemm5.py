#!/usr/bin/env python
"""Probe 5: big-K dense packed conv — one (M, 9L) @ (9L, N) dot per stripe.

S is assembled from 9 row/col-shifted FULL-width copies of the zero-padded
input (lane-aligned 128-wide stores, no sub-width ops), and the single
K=1152 dot lets the MXU accumulate across K tiles internally instead of
round-tripping an f32 accumulator through VMEM. Compared against the
9-dot accumulator form at the same R.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W2, CIN, COUT = 304, 32, 32
L, N = 4 * CIN, 4 * COUT
SHIFTS = [(by, bx) for by in (-1, 0, 1) for bx in (-1, 0, 1)]


def _sync(x):
    _ = float(jnp.asarray(x).reshape(-1)[0])


def _time(f, x, w, n_short=20, n_long=100):
    _sync(f(x, w))

    def chain(n):
        y = x
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(y, w)
        _sync(y)
        return time.perf_counter() - t0

    chain(n_short)
    chain(n_long)
    vals = []
    for _ in range(3):
        ts, tl = chain(n_short), chain(n_long)
        vals.append((tl - ts) / (n_long - n_short))
    return float(np.median(vals))


def make_bigk(R):
    M = R * W2

    def k(x_ref, w_ref, o_ref, p_ref, s_ref):
        p_ref[:] = jnp.zeros_like(p_ref)
        p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
        for t, (by, bx) in enumerate(SHIFTS):
            s_ref[:, :, t * L : (t + 1) * L] = p_ref[
                1 + by : 1 + by + R, 1 + bx : 1 + bx + W2, :
            ]
        o_ref[0] = jnp.dot(
            s_ref[:].reshape(M, 9 * L),
            w_ref[:],
            preferred_element_type=jnp.float32,
        ).reshape(R, W2, N).astype(jnp.bfloat16)

    return k, [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16),
               pltpu.VMEM((R, W2, 9 * L), jnp.bfloat16)]


def make_acc(R):
    M = R * W2

    def k(x_ref, w_ref, o_ref, p_ref, acc_ref):
        p_ref[:] = jnp.zeros_like(p_ref)
        p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
        for t, (by, bx) in enumerate(SHIFTS):
            blk = p_ref[1 + by : 1 + by + R, 1 + bx : 1 + bx + W2, :]
            d = jnp.dot(blk.reshape(M, L), w_ref[t * L : (t + 1) * L, :],
                        preferred_element_type=jnp.float32)
            if t == 0:
                acc_ref[:] = d
            else:
                acc_ref[:] += d
        o_ref[0] = acc_ref[:].reshape(R, W2, N).astype(jnp.bfloat16)

    return k, [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16),
               pltpu.VMEM((M, N), jnp.float32)]


def run(name, maker, R):
    k, scratch = maker(R)
    ns = max(1, 96 // R)
    x = jnp.asarray(
        np.random.default_rng(0).random((ns, R, W2, L)) * 0.1, jnp.bfloat16
    )
    w = jnp.asarray(
        np.random.default_rng(1).random((9 * L, N)) * 0.05, jnp.bfloat16
    )
    fn = pl.pallas_call(
        k,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, R, W2, L), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * L, N), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W2, N), lambda s: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, R, W2, N), jnp.bfloat16),
        scratch_shapes=scratch,
    )
    try:
        dt = _time(jax.jit(fn), x, w)
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s} R={R:3d} FAILED {type(e).__name__} {str(e)[-150:]}",
              flush=True)
        return
    px = ns * R * W2
    dense = px * 9 * L * N * 2
    useful = px * 4 * 9 * CIN * COUT * 2
    print(f"{name:10s} R={R:3d} {dt*1e6:8.1f} us  "
          f"dense {dense/dt/1e12:6.2f} TF/s  useful {useful/dt/1e12:6.2f}",
          flush=True)


def run_ns(name, maker, R, ns):
    k, scratch = maker(R)
    x = jnp.asarray(
        np.random.default_rng(0).random((ns, R, W2, L)) * 0.1, jnp.bfloat16
    )
    w = jnp.asarray(
        np.random.default_rng(1).random((9 * L, N)) * 0.05, jnp.bfloat16
    )
    fn = pl.pallas_call(
        k, grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, R, W2, L), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * L, N), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W2, N), lambda s: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, R, W2, N), jnp.bfloat16),
        scratch_shapes=scratch,
    )
    try:
        dt = _time(jax.jit(fn), x, w)
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s} R={R:3d} ns={ns:4d} FAILED {str(e)[-120:]}",
              flush=True)
        return None
    px = ns * R * W2
    dense = px * 9 * L * N * 2
    print(f"{name:10s} R={R:3d} ns={ns:4d} {dt*1e6:8.1f} us  "
          f"dense {dense/dt/1e12:6.2f} TF/s", flush=True)
    return dt


if __name__ == "__main__":
    t_small = run_ns("bigk", make_bigk, 8, 24)
    t_big = run_ns("bigk", make_bigk, 8, 96)
    if t_small and t_big:
        per_stripe = (t_big - t_small) / (96 - 24)
        dense = 8 * W2 * 9 * L * N * 2
        useful = 8 * W2 * 4 * 9 * CIN * COUT * 2
        print(f"isolated per-stripe: {per_stripe*1e6:.2f} us  "
              f"dense {dense/per_stripe/1e12:.2f} TF/s  "
              f"useful {useful/per_stripe/1e12:.2f} TF/s", flush=True)
