#!/usr/bin/env python
"""Measure the achieved VPU peak on this chip (VERDICT r4 item 6).

The roofline model's VPU ceiling was a back-of-envelope estimate
(lanes x sublanes x ALUs x FMA x clock ~= 13.7 TF/s,
``utils/roofline.py``). This probe anchors it: a Pallas kernel holding one
f32 block in VMEM and running a long chain of dependent-free FMAs (8
independent accumulator chains so the VPU pipelines are full, not
latency-bound), timed with the same device-chained marginal protocol as
bench.py. Also measures the transcendental rate (exp chains) to check the
model's 8-FLOPs-per-transcendental convention.

Usage:
  python scripts/probe_vpu_peak.py [--op fma|exp|both] [--dtype f32|bf16]

Prints one JSON line per measurement:
  {"op": "fma", "dtype": "float32", "tflops": N, ...}
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 8 independent accumulator chains per loop iteration: each FMA depends
# only on its own chain, so the VPU retires one FMA per chain per issue
# slot instead of stalling on the previous result's latency.
N_CHAINS = 8


def _fma_kernel(x_ref, o_ref, *, iters: int):
    x = x_ref[:]
    a = x * 1.0000001 + 0.0000001  # distinct live values per chain seed
    accs = [a + float(c) * 1e-7 for c in range(N_CHAINS)]

    def body(i, accs):
        # one FMA per chain per iteration; multiplier/addend reuse the
        # loop-invariant x so no extra loads enter the loop
        return tuple(acc * 0.9999999 + x for acc in accs)

    accs = lax.fori_loop(0, iters, body, tuple(accs))
    out = accs[0]
    for acc in accs[1:]:
        out = out + acc
    o_ref[:] = out


def _exp_kernel(x_ref, o_ref, *, iters: int):
    x = x_ref[:]
    accs = [x * (0.1 + 0.01 * c) for c in range(N_CHAINS)]

    def body(i, accs):
        # exp of a value kept near 0 so the result stays finite; the
        # multiply keeps the chain live (1 transcendental + 1 mul per
        # chain per iteration)
        return tuple(jnp.exp(acc * -0.5) for acc in accs)

    accs = lax.fori_loop(0, iters, body, tuple(accs))
    out = accs[0]
    for acc in accs[1:]:
        out = out + acc
    o_ref[:] = out


def _probe(op: str, dtype, rows: int, cols: int, iters: int,
           n_short: int = 2, n_long: int = 8, repeats: int = 5) -> dict:
    kernel = {"fma": _fma_kernel, "exp": _exp_kernel}[op]
    x = jnp.asarray(
        np.random.default_rng(0).random((rows, cols), np.float32) * 0.1,
        dtype,
    )
    call = pl.pallas_call(
        functools.partial(kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def chain(k):
        @jax.jit
        def run(v):
            return lax.fori_loop(0, k, lambda i, v: call(v), v)

        return run

    run_s, run_l = chain(n_short), chain(n_long)

    def sync(v):
        _ = float(v[0, 0])

    sync(run_s(x))  # compile + warmup
    sync(run_l(x))
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(run_s(x))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(run_l(x))
        tl = time.perf_counter() - t0
        if tl > ts:
            rates.append((n_long - n_short) / (tl - ts))  # calls/sec
        else:
            rates.append(n_long / max(tl, 1e-9))
    calls_per_sec = float(np.median(rates))
    best_calls_per_sec = float(np.max(rates))
    elems = rows * cols
    if op == "fma":
        flops_per_call = 2.0 * elems * iters * N_CHAINS  # FMA = 2 FLOPs
        ops_per_call = float(elems) * iters * N_CHAINS
    else:
        # count raw transcendental ops; the tflops field applies the
        # roofline's 8-FLOPs-per-transcendental convention (+1 mul)
        ops_per_call = float(elems) * iters * N_CHAINS
        flops_per_call = (8.0 + 2.0) * ops_per_call
    return {
        "op": op,
        "dtype": str(jnp.dtype(dtype).name),
        "rows": rows,
        "cols": cols,
        "iters": iters,
        "chains": N_CHAINS,
        "tflops": round(flops_per_call * calls_per_sec / 1e12, 3),
        # a peak probe wants the best sustained repeat (tunnel jitter only
        # ever subtracts): this is the number the roofline constant cites
        "tflops_best": round(flops_per_call * best_calls_per_sec / 1e12, 3),
        "gops": round(ops_per_call * calls_per_sec / 1e9, 2),
        "calls_per_sec": round(calls_per_sec, 2),
        "backend": jax.default_backend(),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="both", choices=("fma", "exp", "both"))
    ap.add_argument("--dtype", default="f32", choices=("f32", "bf16"))
    # 8x256 f32 x 8 chains = 16 live (8,128) vector registers: the swept
    # optimum (3.5 TF/s). Larger blocks spill the accumulators to VMEM and
    # the probe decays into a VMEM-bandwidth measurement (128x512: 1.07
    # TF/s); more chains (16 -> 32 registers) spill too (1.76 TF/s).
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--cols", type=int, default=256)
    ap.add_argument("--iters", type=int, default=40000)
    args = ap.parse_args()
    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    ops = ("fma", "exp") if args.op == "both" else (args.op,)
    for op in ops:
        print(json.dumps(_probe(op, dt, args.rows, args.cols, args.iters)),
              flush=True)


if __name__ == "__main__":
    main()
