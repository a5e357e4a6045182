#!/usr/bin/env python
"""Probe 2: slab-assembly strategies for the patch-GEMM conv kernel.

V-chunk : zero+sub-width stores into a 128-K chunk, 4 accumulated dots
V-concat: jnp.concatenate 16 sub-width slices -> one K=512 dot
V-direct: 16 direct (M,32)@(32,128) dots, no assembly, f32 scratch acc
Each at R in {16, 32}. All shifts static slices. Reports dense TF/s and the
useful-conv-FLOP rate (4 original px per packed row, 9*Cin*Cout each).
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
NSTRIPES = 12
ENTRIES = [
    (oy, ox, ((oy % 2) * 2 + (ox % 2)) * CIN)
    for oy in (-1, 0, 1, 2)
    for ox in (-1, 0, 1, 2)
]


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


def store_entry(s_ref, x_ref, j, ox, p, cin, k_stride):
    lo, hi = max(0, -ox), W2 - max(0, ox)
    s_ref[:, lo:hi, j * cin : j * cin + cin] = x_ref[
        0, :, lo + ox : hi + ox, p : p + cin
    ]


def make_chunk(R):
    M = R * W2

    def k(x_ref, w_ref, o_ref, s_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for c in range(4):
            s_ref[:] = jnp.zeros_like(s_ref)
            for j in range(4):
                oy, ox, p = ENTRIES[c * 4 + j]
                store_entry(s_ref, x_ref, j, ox, p, CIN, L)
            acc_ref[:] += jnp.dot(
                s_ref[:].reshape(M, L),
                w_ref[c * L : (c + 1) * L, :],
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = acc_ref[:].reshape(R, W2, N).astype(jnp.bfloat16)

    return k, [pltpu.VMEM((R, W2, L), jnp.bfloat16),
               pltpu.VMEM((M, N), jnp.float32)]


def make_concat(R):
    M = R * W2

    def k(x_ref, w_ref, o_ref):
        parts = []
        for oy, ox, p in ENTRIES:
            lo, hi = max(0, -ox), W2 - max(0, ox)
            blk = x_ref[0, :, :, p : p + CIN]
            # static shift via slice + zero-pad columns
            pads = [(0, 0), (lo, W2 - hi), (0, 0)]
            blk = jnp.pad(blk[:, lo + ox : hi + ox, :], pads)
            parts.append(blk)
        s = jnp.concatenate(parts, axis=-1).reshape(M, 16 * CIN)
        o_ref[0] = jnp.dot(
            s, w_ref[:], preferred_element_type=jnp.float32
        ).reshape(R, W2, N).astype(jnp.bfloat16)

    return k, []


def make_direct(R):
    M = R * W2

    def k(x_ref, w_ref, o_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for idx, (oy, ox, p) in enumerate(ENTRIES):
            lo, hi = max(0, -ox), W2 - max(0, ox)
            blk = x_ref[0, :, lo + ox : hi + ox, p : p + CIN]
            pads = [(0, 0), (lo, W2 - hi), (0, 0)]
            blk = jnp.pad(blk, pads)
            acc_ref[:] += jnp.dot(
                blk.reshape(M, CIN),
                w_ref[idx * CIN : (idx + 1) * CIN, :],
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = acc_ref[:].reshape(R, W2, N).astype(jnp.bfloat16)

    return k, [pltpu.VMEM((M, N), jnp.float32)]


def run(name, maker, R):
    k, scratch = maker(R)
    ns = NSTRIPES * 16 // R
    x = jnp.asarray(
        np.random.default_rng(0).random((ns, R, W2, L)) * 0.1, jnp.bfloat16
    )
    w = jnp.asarray(
        np.random.default_rng(1).random((16 * CIN, N)) * 0.05, jnp.bfloat16
    )
    fn = pl.pallas_call(
        k,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, R, W2, L), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * CIN, N), lambda s: (0, 0),
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
        print(f"{name:10s} R={R:3d} FAILED {type(e).__name__} {str(e)[:120]}")
        return
    px = ns * R * W2  # packed rows
    dense = px * (16 * CIN) * N * 2
    useful = px * 4 * 9 * CIN * COUT * 2
    print(f"{name:10s} R={R:3d} {dt*1e6:8.1f} us  "
          f"dense {dense/dt/1e12:6.2f} TF/s  useful {useful/dt/1e12:6.2f}")


if __name__ == "__main__":
    for R in (16, 32):
        run("chunk", make_chunk, R)
        run("concat", make_concat, R)
        run("direct", make_direct, R)
