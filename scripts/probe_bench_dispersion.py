"""Bench-dispersion probe (VERDICT r3 item 4).

BENCH_r02 measured min 43.1k / max 45.9k (±3%) over 7 repeats; BENCH_r03
measured 39.3k–55.7k (±18%) with the same protocol. This probe reproduces
the headline measurement under controlled variants to bisect the spread:

  A1/A2  shipping defaults, run twice with a gap  -> session drift
  B      denoise_guide="perchannel"               -> round-3 default change
  C      round-2 denoise params (sigma .12/str .5)-> round-3 default change
  D      n_long=120                               -> protocol sensitivity
  E      defaults under host CPU load             -> host-contention theory
         (the round-4 finding: a concurrent pytest run on this host turned
         the config-7 video bench numbers into garbage — chained dispatch
         is host-Python-bound between device steps)

Prints one JSON line per variant. Run alone on an idle host (that is the
point) with the real chip.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import json
import multiprocessing
import time

import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


def _sync(x):
    _ = int(x[(0,) * x.ndim])


def measure(cfg, batch=48, repeats=7, n_short=8, n_long=60,
            chain_mode="python"):
    """chain_mode="python": one tunnel dispatch per iteration (the pre-r4
    headline protocol under test here). "device": the round-4 fix — the
    whole chain is one jitted lax.fori_loop (bench._device_chain)."""
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
    return {
        "median": round(med, 1),
        "min": round(float(a.min()), 1),
        "max": round(float(a.max()), 1),
        "iqr_pct": round(
            100 * float(np.percentile(a, 75) - np.percentile(a, 25)) / med, 2),
        "spread_pct": round(100 * float(a.max() - a.min()) / med / 2, 1),
        "rates": [round(r) for r in rates],
        "t_short_ms": [round(t * 1e3, 2) for t in shorts],
        "t_long_ms": [round(t * 1e3, 2) for t in longs],
    }


def _busy(stop):
    x = 1.0
    while not stop.is_set():
        x = x * 1.0000001 + 1e-9


def main():
    out = {}
    out["A1_default"] = measure(PipelineConfig())
    out["A1_device_chain"] = measure(PipelineConfig(), chain_mode="device")
    out["B_perchannel"] = measure(PipelineConfig(denoise_guide="perchannel"))
    out["C_r2_denoise"] = measure(
        PipelineConfig(denoise_sigma=0.12, denoise_strength=0.5))
    out["D_long120"] = measure(PipelineConfig(), n_long=120)
    out["A2_default_again"] = measure(PipelineConfig())
    out["A2_device_chain"] = measure(PipelineConfig(), chain_mode="device")

    stop = multiprocessing.Event()
    workers = [multiprocessing.Process(target=_busy, args=(stop,))
               for _ in range(max(2, multiprocessing.cpu_count()))]
    for w in workers:
        w.start()
    try:
        out["E_host_load"] = measure(PipelineConfig())
        out["E_host_load_device_chain"] = measure(PipelineConfig(),
                                                  chain_mode="device")
    finally:
        stop.set()
        for w in workers:
            w.join(timeout=5)
            if w.is_alive():
                w.terminate()
    for k, v in out.items():
        print(json.dumps({"variant": k, **v}), flush=True)


if __name__ == "__main__":
    main()
