#!/usr/bin/env python
"""Measure conv-stack implementations on the real chip (VERDICT r2 item 1).

Compares, per learned model, XLA's conv_general_dilated lowering against the
GEMM reformulations of ops/patch_conv.py (and, when present, the Pallas
patch-GEMM kernel), at 600x400 in the shipping compute dtype. Chained
iterations + scalar-fetch sync, same methodology as bench.py.

Usage: python scripts/bench_conv.py [--batch 16] [--impls xla,gemm]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(x):
    _ = float(jnp.asarray(x).reshape(-1)[0])


def _time_chain(step, x0, n):
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = step(x)
    _sync(x)
    return time.perf_counter() - t0


def _rate(step, x0, batch, n_short=4, n_long=16, repeats=5):
    _sync(step(x0))  # compile
    _time_chain(step, x0, n_short)
    _time_chain(step, x0, n_long)
    rates = []
    for _ in range(repeats):
        ts = _time_chain(step, x0, n_short)
        tl = _time_chain(step, x0, n_long)
        marginal = (tl - ts) / (n_long - n_short)
        if marginal > 0:
            rates.append(batch / marginal)
    return float(np.median(rates)), rates


def _steps(method, impl, dtype):
    """Returns step(x)->x (image -> image-shaped) for chaining."""
    if method == "curve":
        from low_light_image_enhancement_tpu.models.curve_cnn import (
            apply_curve_cnn,
            apply_curve_cnn_gemm,
            init_curve_cnn,
        )

        from low_light_image_enhancement_tpu.models.curve_cnn import (
            apply_curve_cnn_pallas,
        )

        params = init_curve_cnn(jax.random.PRNGKey(0))
        from low_light_image_enhancement_tpu.models.curve_cnn import (
            apply_curve_cnn_packed,
        )

        apply = {"xla": apply_curve_cnn, "gemm": apply_curve_cnn_gemm,
                 "pallas": apply_curve_cnn_pallas,
                 "packed": apply_curve_cnn_packed,
                 "packed12": lambda p, x, compute_dtype: apply_curve_cnn_packed(
                     p, x, compute_dtype=compute_dtype, block=(1, 2))}[impl]

        def step(x, params=params):
            maps = apply(params, x, compute_dtype=dtype)
            return jnp.clip(jnp.abs(maps[:, 0]), 0.0, 1.0)

        return step
    if method == "fcn":
        from low_light_image_enhancement_tpu.models.fcn import (
            apply_fcn,
            apply_fcn_gemm,
            init_fcn,
        )

        from low_light_image_enhancement_tpu.models.fcn import (
            apply_fcn_pallas,
        )

        params = init_fcn(jax.random.PRNGKey(0))
        from low_light_image_enhancement_tpu.models.fcn import (
            apply_fcn_packed,
        )

        apply = {"xla": apply_fcn, "gemm": apply_fcn_gemm,
                 "pallas": apply_fcn_pallas,
                 "packed": apply_fcn_packed,
                 "packed12": lambda p, x, compute_dtype: apply_fcn_packed(
                     p, x, compute_dtype=compute_dtype, block=(1, 2))}[impl]
        return lambda x: apply(params, x, compute_dtype=dtype)
    if method == "decom":
        from low_light_image_enhancement_tpu.models.decom import (
            apply_decom_net,
            apply_decom_net_gemm,
            init_decom_net,
        )

        from low_light_image_enhancement_tpu.models.decom import (
            apply_decom_net_pallas,
        )

        params = init_decom_net(jax.random.PRNGKey(0))
        from low_light_image_enhancement_tpu.models.decom import (
            apply_decom_net_packed,
        )

        apply = {"xla": apply_decom_net, "gemm": apply_decom_net_gemm,
                 "pallas": apply_decom_net_pallas,
                 "packed": apply_decom_net_packed,
                 "packed12": lambda p, x, compute_dtype: apply_decom_net_packed(
                     p, x, compute_dtype=compute_dtype, block=(1, 2))}[impl]
        return lambda x: apply(params, x, compute_dtype=dtype)[0]
    raise ValueError(method)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--h", type=int, default=400)
    ap.add_argument("--w", type=int, default=600)
    ap.add_argument("--methods", default="curve,fcn,decom")
    ap.add_argument("--impls", default="xla,gemm")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.random((args.batch, 3, args.h, args.w), np.float32)
    )
    print(f"backend={jax.default_backend()} batch={args.batch} "
          f"{args.h}x{args.w} dtype={args.dtype}")
    for method in args.methods.split(","):
        for impl in args.impls.split(","):
            step = jax.jit(_steps(method, impl, dtype))
            try:
                rate, rates = _rate(step, x0, args.batch)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"{method:6s} {impl:6s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")
                continue
            print(f"{method:6s} {impl:6s} {rate:9.1f} img/s  "
                  f"(rates={[round(r, 1) for r in rates]})")


if __name__ == "__main__":
    main()
