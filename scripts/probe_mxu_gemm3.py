#!/usr/bin/env python
"""Probe 3: zero-assembly 'dense 9-dot packed conv' form.

out_packed = sum over 9 block shifts (by, bx) of shift(X) @ W'[by,bx],
with W' (128, 128) carrying the phase routing as weight sparsity. No lane
ops at all: X is copied once into a zero-padded (R+2, W2+2, L) scratch and
the 9 shifted reads are interior static slices.

Dense FLOPs = 9*L*N per packed px (2.25x patch-GEMM's 16Cin*4Cout), but the
kernel is pure MXU streaming — wins if dots run >~57% of peak.
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


def make_dense9(R, use_acc):
    M = R * W2

    def k(*refs):
        if use_acc:
            x_ref, w_ref, o_ref, p_ref, acc_ref = refs
        else:
            x_ref, w_ref, o_ref, p_ref = refs
        p_ref[:] = jnp.zeros_like(p_ref)
        p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
        terms = []
        for t, (by, bx) in enumerate(SHIFTS):
            blk = p_ref[1 + by : 1 + by + R, 1 + bx : 1 + bx + W2, :]
            d = jnp.dot(
                blk.reshape(M, L),
                w_ref[t * L : (t + 1) * L, :],
                preferred_element_type=jnp.float32,
            )
            if use_acc:
                if t == 0:
                    acc_ref[:] = d
                else:
                    acc_ref[:] += d
            else:
                terms.append(d)
        acc = acc_ref[:] if use_acc else sum(terms)
        o_ref[0] = acc.reshape(R, W2, N).astype(jnp.bfloat16)

    scratch = [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16)]
    if use_acc:
        scratch.append(pltpu.VMEM((M, N), jnp.float32))
    return k, scratch


def run(name, R, use_acc):
    k, scratch = make_dense9(R, use_acc)
    ns = 192 // R
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
        print(f"{name:12s} R={R:3d} FAILED {type(e).__name__} {str(e)[-180:]}")
        return
    px = ns * R * W2
    dense = px * 9 * L * N * 2
    useful = px * 4 * 9 * CIN * COUT * 2
    print(f"{name:12s} R={R:3d} {dt*1e6:8.1f} us  "
          f"dense {dense/dt/1e12:6.2f} TF/s  useful {useful/dt/1e12:6.2f}")


if __name__ == "__main__":
    for R in (16, 24):
        run("dense9-expr", R, False)
        run("dense9-acc", R, True)
