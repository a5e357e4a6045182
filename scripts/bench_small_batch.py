"""Small-batch learned-method e2e bench (VERDICT r3 item 2).

One parameterized script (replacing further probe_* sprawl): measures the
u8->u8 pipeline rate per (method, conv_impl, batch) on the real chip with
the chained-marginal protocol, plus the conv-stack-only rate for the
cascade kernel. Usage:

  python scripts/bench_small_batch.py [--methods fcn curve]
      [--impls xla packed cascade] [--batches 8 16 24 32 48]

Prints one JSON line per cell.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


def _sync(x):
    _ = int(x[(0,) * x.ndim])


def e2e_rate(cfg, batch, repeats=5, n_short=4, n_long=24):
    from bench import _device_chain

    pipe = EnhancePipeline(cfg)
    lows, _ = synth_batch(8, 400, 600)
    lows = np.tile(lows, (-(-batch // 8), 1, 1, 1))[:batch]
    dev = jnp.asarray(lows)
    _sync(pipe.enhance_batch_device(dev))
    fn = pipe._compiled(batch, 400, 600)
    runs = {n: _device_chain(fn, pipe.model_params, n)
            for n in (n_short, n_long)}

    def chain(n):
        t0 = time.perf_counter()
        _sync(runs[n](dev))
        return time.perf_counter() - t0

    chain(n_short)
    chain(n_long)
    rates = []
    for _ in range(repeats):
        ts, tl = chain(n_short), chain(n_long)
        rates.append(batch * (n_long - n_short) / (tl - ts) if tl > ts
                     else batch * n_long / max(tl, 1e-9))
    return float(np.median(rates))


def cascade_stack_rate(batch, repeats=5):
    """Conv-stack-only: the fused cascade on packed activations at fcn's
    600x400 working shape, chained."""
    from low_light_image_enhancement_tpu.kernels.fcn_cascade import (
        fcn_cascade_mxu,
    )
    from low_light_image_enhancement_tpu.kernels.mxu_conv import (
        pack_dense9_weights,
    )
    from low_light_image_enhancement_tpu.models.fcn import _dilations, init_fcn

    params = init_fcn(jax.random.PRNGKey(0))
    dils = _dilations(7)
    ws = [pack_dense9_weights(params[f"c{i}"]["w"], dilation=d)
          for i, d in enumerate(dils[1:], start=2)]
    bs = [params[f"c{i}"]["b"] for i in range(2, 8)]
    steps = [max(1, d // 2) for d in dils[1:]]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 200, 304, 96)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    from jax import lax

    wsb = [w.astype(jnp.bfloat16) for w in ws]

    def one(v):
        return fcn_cascade_mxu(v, wsb, bs, steps)

    runs = {k: jax.jit(lambda v, k=k: lax.fori_loop(
        0, k, lambda i, u: one(u), v)) for k in (2, 10)}
    _ = np.asarray(runs[2](x)[0, 0, 0, 0])
    _ = np.asarray(runs[10](x)[0, 0, 0, 0])

    def chain(n):
        t0 = time.perf_counter()
        _ = np.asarray(runs[n](x)[0, 0, 0, 0])
        return time.perf_counter() - t0

    rates = []
    for _ in range(repeats):
        ts, tl = chain(2), chain(10)
        rates.append(batch * 8 / (tl - ts) if tl > ts
                     else batch * 10 / max(tl, 1e-9))
    return float(np.median(rates))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="*", default=["fcn", "curve"])
    ap.add_argument("--impls", nargs="*",
                    default=["xla", "packed", "cascade"])
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[8, 16, 24, 32, 48])
    ap.add_argument("--stack-only", action="store_true",
                    help="also measure the cascade kernel stack-only")
    args = ap.parse_args()
    for method in args.methods:
        for impl in args.impls:
            if impl == "cascade" and method != "fcn":
                continue
            for batch in args.batches:
                try:
                    r = e2e_rate(
                        PipelineConfig(method=method, conv_impl=impl), batch)
                    print(json.dumps({
                        "method": method, "impl": impl, "batch": batch,
                        "img_per_sec": round(r, 1),
                    }), flush=True)
                except Exception as e:
                    print(json.dumps({
                        "method": method, "impl": impl, "batch": batch,
                        "error": f"{type(e).__name__}: {e}"[:300],
                    }), flush=True)
    if args.stack_only:
        for batch in args.batches:
            try:
                r = cascade_stack_rate(batch)
                print(json.dumps({"stack": "fcn_cascade", "batch": batch,
                                  "img_per_sec": round(r, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"stack": "fcn_cascade", "batch": batch,
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
