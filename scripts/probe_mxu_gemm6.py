#!/usr/bin/env python
"""Probe 6: patch-GEMM chunk assembly via in-kernel jnp.concatenate reads
from a zero-padded P scratch (no sub-width stores, no masking), vs the
store-based chunk and the zero-assembly dense9 forms.

Goal: patch-GEMM's 16/9 FLOP inflation at dense9's ~100 TF/s streaming.
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
# patch-GEMM entries: (oy, ox) -> (row shift by, col shift bx, phase p)
ENTRIES = []
for oy in (-1, 0, 1, 2):
    by, py = divmod(oy, 2)
    for ox in (-1, 0, 1, 2):
        bx, px = divmod(ox, 2)
        ENTRIES.append((by, bx, (py * 2 + px) * CIN))


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


def make_concat_chunk(R):
    M = R * W2

    def k(x_ref, w_ref, o_ref, p_ref, acc_ref):
        p_ref[:] = jnp.zeros_like(p_ref)
        p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
        for c in range(4):  # one 128-K chunk per patch row oy
            parts = []
            for j in range(4):
                by, bx, p = ENTRIES[c * 4 + j]
                parts.append(
                    p_ref[1 + by : 1 + by + R, 1 + bx : 1 + bx + W2,
                          p : p + CIN]
                )
            s = jnp.concatenate(parts, axis=-1).reshape(M, L)
            d = jnp.dot(s, w_ref[c * L : (c + 1) * L, :],
                        preferred_element_type=jnp.float32)
            if c == 0:
                acc_ref[:] = d
            else:
                acc_ref[:] += d
        o_ref[0] = acc_ref[:].reshape(R, W2, N).astype(jnp.bfloat16)

    return k, [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16),
               pltpu.VMEM((M, N), jnp.float32)], 16 * CIN


def make_concat_bigk(R):
    M = R * W2

    def k(x_ref, w_ref, o_ref, p_ref):
        p_ref[:] = jnp.zeros_like(p_ref)
        p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
        parts = []
        for by, bx, p in ENTRIES:
            parts.append(
                p_ref[1 + by : 1 + by + R, 1 + bx : 1 + bx + W2, p : p + CIN]
            )
        s = jnp.concatenate(parts, axis=-1).reshape(M, 16 * CIN)
        o_ref[0] = jnp.dot(
            s, w_ref[:], preferred_element_type=jnp.float32
        ).reshape(R, W2, N).astype(jnp.bfloat16)

    return k, [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16)], 16 * CIN


def run(name, maker, R, ns):
    k, scratch, krows = maker(R)
    x = jnp.asarray(
        np.random.default_rng(0).random((ns, R, W2, L)) * 0.1, jnp.bfloat16
    )
    w = jnp.asarray(
        np.random.default_rng(1).random((krows, N)) * 0.05, jnp.bfloat16
    )
    fn = pl.pallas_call(
        k, grid=(ns,),
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
        print(f"{name:14s} R={R:3d} ns={ns:3d} FAILED {str(e)[-140:]}",
              flush=True)
        return
    px = ns * R * W2
    dense = px * krows * N * 2
    useful = px * 4 * 9 * CIN * COUT * 2
    print(f"{name:14s} R={R:3d} ns={ns:3d} {dt*1e6:8.1f} us  "
          f"dense {dense/dt/1e12:6.2f} TF/s  useful {useful/dt/1e12:6.2f}",
          flush=True)


if __name__ == "__main__":
    run("concat-chunk", make_concat_chunk, 16, 48)
    run("concat-bigk", make_concat_bigk, 16, 48)
    run("concat-chunk", make_concat_chunk, 32, 24)
