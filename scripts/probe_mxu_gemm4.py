#!/usr/bin/env python
"""Probe 4: dependency-breaking variants.

chunk-dbuf : patch-GEMM chunks with two alternating S buffers (VPU slab
             assembly of chunk c+1 can overlap the MXU dot of chunk c)
chunk-acc2 : + two accumulators (even/odd chunks) summed at the end
dense9-acc2: dense 9-dot with two accumulators
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
ENTRIES = [
    (oy, ox, ((oy % 2) * 2 + (ox % 2)) * CIN)
    for oy in (-1, 0, 1, 2)
    for ox in (-1, 0, 1, 2)
]
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


def _store(s_ref, x_ref, j, ox, p):
    lo, hi = max(0, -ox), W2 - max(0, ox)
    s_ref[:, lo:hi, j * CIN : (j + 1) * CIN] = x_ref[
        0, :, lo + ox : hi + ox, p : p + CIN
    ]


def make_chunk_dbuf(R, n_acc):
    M = R * W2

    def k(x_ref, w_ref, o_ref, s0, s1, *accs):
        bufs = (s0, s1)
        for a in accs:
            a[:] = jnp.zeros_like(a)
        for c in range(4):
            s = bufs[c % 2]
            s[:] = jnp.zeros_like(s)
            for j in range(4):
                oy, ox, p = ENTRIES[c * 4 + j]
                _store(s, x_ref, j, ox, p)
            accs[c % n_acc][:] += jnp.dot(
                s[:].reshape(M, L),
                w_ref[c * L : (c + 1) * L, :],
                preferred_element_type=jnp.float32,
            )
        tot = accs[0][:]
        for a in accs[1:]:
            tot = tot + a[:]
        o_ref[0] = tot.reshape(R, W2, N).astype(jnp.bfloat16)

    scratch = [pltpu.VMEM((R, W2, L), jnp.bfloat16)] * 2 + \
        [pltpu.VMEM((M, N), jnp.float32)] * n_acc
    return k, scratch, 16 * CIN


def make_dense9_acc2(R):
    M = R * W2

    def k(x_ref, w_ref, o_ref, p_ref, a0, a1):
        p_ref[:] = jnp.zeros_like(p_ref)
        p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
        accs = (a0, a1)
        for a in accs:
            a[:] = jnp.zeros_like(a)
        for t, (by, bx) in enumerate(SHIFTS):
            blk = p_ref[1 + by : 1 + by + R, 1 + bx : 1 + bx + W2, :]
            accs[t % 2][:] += jnp.dot(
                blk.reshape(M, L),
                w_ref[t * L : (t + 1) * L, :],
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = (a0[:] + a1[:]).reshape(R, W2, N).astype(jnp.bfloat16)

    scratch = [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16),
               pltpu.VMEM((M, N), jnp.float32),
               pltpu.VMEM((M, N), jnp.float32)]
    return k, scratch, 9 * L


def run(name, maker, R, *a):
    k, scratch, krows = maker(R, *a)
    ns = 192 // R
    x = jnp.asarray(
        np.random.default_rng(0).random((ns, R, W2, L)) * 0.1, jnp.bfloat16
    )
    w = jnp.asarray(
        np.random.default_rng(1).random((krows, N)) * 0.05, jnp.bfloat16
    )
    fn = pl.pallas_call(
        k,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, R, W2, L), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((krows, N), lambda s: (0, 0),
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
        print(f"{name:14s} R={R:3d} FAILED {type(e).__name__} {str(e)[-160:]}")
        return
    px = ns * R * W2
    dense = px * krows * N * 2
    useful = px * 4 * 9 * CIN * COUT * 2
    print(f"{name:14s} R={R:3d} {dt*1e6:8.1f} us  "
          f"dense {dense/dt/1e12:6.2f} TF/s  useful {useful/dt/1e12:6.2f}")


if __name__ == "__main__":
    run("chunk-dbuf", make_chunk_dbuf, 16, 1)
    run("chunk-acc2", make_chunk_dbuf, 16, 2)
    run("dense9-acc2", make_dense9_acc2, 16)
