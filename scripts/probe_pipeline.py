#!/usr/bin/env python
"""Parameterized pipeline probes (one script, subcommand per question —
the folded form VERDICT r3/r4 asked for, replacing the one-off
probe_guided.py / probe_layer_cost.py / probe_bench_dispersion.py).

Usage: python scripts/probe_pipeline.py {guided,layer-cost,dispersion} ...

  guided      quality + throughput rows per denoise-tail variant
              (VERDICT r3 item 3's record; run alone on the real chip)
  layer-cost  conv2d_patch_mxu production-layer cost vs XLA conv at
              identical shapes (packing in/out of jit)
  dispersion  reproduce the headline measurement under controlled
              variants to bisect session spread (VERDICT r3 item 4's
              record: per-iteration tunnel dispatch latency; the
              device-chain arms show the round-4 fix)

Each row prints as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    _ = int(np.asarray(jnp.asarray(x).reshape(-1)[0]))


def _headline_rate(cfg, batch=48, repeats=5, n_short=8, n_long=60,
                   chain_mode="device", detail=False):
    """600x400 chained-rate protocol (bench.py's) for an arbitrary config.
    ``chain_mode="python"`` pays one tunnel dispatch per iteration (the
    pre-r4 protocol, kept for the dispersion bisect)."""
    from low_light_image_enhancement_tpu.data.synth import synth_batch
    from low_light_image_enhancement_tpu.pipeline import EnhancePipeline

    pipe = EnhancePipeline(cfg)
    lows, _ = synth_batch(8, 400, 600)
    lows = np.tile(lows, (-(-batch // 8), 1, 1, 1))[:batch]
    dev = jnp.asarray(lows)
    step = pipe.enhance_batch_device
    _sync(step(dev))

    if chain_mode == "device":
        from bench import _device_chain

        fn = pipe._compiled(batch, 400, 600)
        runs = {n: _device_chain(fn, pipe.model_params, n)
                for n in (n_short, n_long)}

        def chain(n):
            t0 = time.perf_counter()
            _sync(runs[n](dev))
            return time.perf_counter() - t0
    else:
        def chain(n):
            t0 = time.perf_counter()
            x = dev
            for _ in range(n):
                x = step(x)
            _sync(x)
            return time.perf_counter() - t0

    chain(n_short)
    chain(n_long)
    rates, shorts, longs = [], [], []
    for _ in range(repeats):
        ts, tl = chain(n_short), chain(n_long)
        shorts.append(ts)
        longs.append(tl)
        rates.append(batch * (n_long - n_short) / (tl - ts) if tl > ts
                     else batch * n_long / max(tl, 1e-9))
    a = np.asarray(rates)
    med = float(np.median(a))
    if not detail:
        return med
    return {
        "median": round(med, 1),
        "min": round(float(a.min()), 1),
        "max": round(float(a.max()), 1),
        "iqr_pct": round(
            100 * float(np.percentile(a, 75) - np.percentile(a, 25)) / med,
            2),
        "spread_pct": round(100 * float(a.max() - a.min()) / med / 2, 1),
        "rates": [round(r) for r in rates],
        "t_short_ms": [round(t * 1e3, 2) for t in shorts],
        "t_long_ms": [round(t * 1e3, 2) for t in longs],
    }


# ------------------------------------------------------------------ #
# guided: quality + throughput per denoise-tail variant
# ------------------------------------------------------------------ #

def cmd_guided(args) -> None:
    from low_light_image_enhancement_tpu.config import PipelineConfig
    from low_light_image_enhancement_tpu.eval.runner import eval_lol
    from low_light_image_enhancement_tpu.pipeline import EnhancePipeline

    rows = [
        ("retinex bilateral (ship default)", PipelineConfig()),
        ("retinex guided r2 eps3e-3", PipelineConfig(denoise_taps="guided")),
        ("retinex guided r4 eps1e-2",
         PipelineConfig(denoise_taps="guided", guided_radius=4,
                        guided_eps=1e-2)),
        ("retinex guided r2 perchannel",
         PipelineConfig(denoise_taps="guided", denoise_guide="perchannel")),
        ("decom guided r2",
         PipelineConfig(method="decom", denoise_taps="guided")),
        ("decom bilateral", PipelineConfig(method="decom")),
        ("curve guided r2 ds1",
         PipelineConfig(method="curve", denoise_taps="guided")),
        ("curve bilateral ds1", PipelineConfig(method="curve")),
    ]
    for name, cfg in rows:
        rep = eval_lol(EnhancePipeline(cfg), parity=True)
        r = _headline_rate(cfg, batch=args.batch)
        print(json.dumps({
            "row": name,
            "psnr": round(rep["psnr_mean"], 2),
            "ssim": round(rep["ssim_mean"], 3),
            "delta_e76": round(rep["delta_e76_mean"], 1),
            "parity_max_u8": rep.get("parity_max_abs_u8"),
            f"img_per_sec_b{args.batch}": round(r, 1),
        }), flush=True)


# ------------------------------------------------------------------ #
# layer-cost: production conv layer vs XLA conv
# ------------------------------------------------------------------ #

def cmd_layer_cost(args) -> None:
    from low_light_image_enhancement_tpu.kernels.mxu_conv import (
        conv2d_patch_mxu,
    )
    from low_light_image_enhancement_tpu.models.layers import conv2d
    from low_light_image_enhancement_tpu.ops.patch_conv import (
        pack_patch_weights,
    )

    B, H2, W2, C = args.batch, 200, 300, args.channels
    L = 4 * C

    def chain_dt(f, x, n_short=10, n_long=40):
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
        dt = chain_dt(f, x)
        print(json.dumps({
            "variant": name,
            "ms_per_layer_batch": round(dt * 1e3, 2),
            "useful_tf_per_sec": round(useful / dt / 1e12, 2),
        }), flush=True)


# ------------------------------------------------------------------ #
# dispersion: bisect headline measurement spread
# ------------------------------------------------------------------ #

def _busy(stop):
    x = 1.0
    while not stop.is_set():
        x = x * 1.0000001 + 1e-9


def cmd_dispersion(args) -> None:
    from low_light_image_enhancement_tpu.config import PipelineConfig

    m = lambda cfg, **kw: _headline_rate(cfg, detail=True,
                                         chain_mode=kw.pop("chain_mode",
                                                           "python"),
                                         repeats=7, **kw)
    out = {}
    out["A1_default"] = m(PipelineConfig())
    out["A1_device_chain"] = m(PipelineConfig(), chain_mode="device")
    out["B_perchannel"] = m(PipelineConfig(denoise_guide="perchannel"))
    out["C_r2_denoise"] = m(
        PipelineConfig(denoise_sigma=0.12, denoise_strength=0.5))
    out["D_long120"] = m(PipelineConfig(), n_long=120)
    out["A2_default_again"] = m(PipelineConfig())
    out["A2_device_chain"] = m(PipelineConfig(), chain_mode="device")

    stop = multiprocessing.Event()
    workers = [multiprocessing.Process(target=_busy, args=(stop,))
               for _ in range(max(2, multiprocessing.cpu_count()))]
    for w in workers:
        w.start()
    try:
        out["E_host_load"] = m(PipelineConfig())
        out["E_host_load_device_chain"] = m(PipelineConfig(),
                                            chain_mode="device")
    finally:
        stop.set()
        for w in workers:
            w.join(timeout=5)
            if w.is_alive():
                w.terminate()
    for k, v in out.items():
        print(json.dumps({"variant": k, **v}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="probe", required=True)
    p = sub.add_parser("guided")
    p.add_argument("--batch", type=int, default=48)
    p.set_defaults(fn=cmd_guided)
    p = sub.add_parser("layer-cost")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--channels", type=int, default=32)
    p.set_defaults(fn=cmd_layer_cost)
    p = sub.add_parser("dispersion")
    p.set_defaults(fn=cmd_dispersion)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
