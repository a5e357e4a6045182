#!/usr/bin/env python
"""Headline benchmark: 600x400 (LOL-sized) enhancement throughput per chip.

Prints exactly ONE JSON line on stdout:
  {"metric": "images_per_sec_per_chip_600x400", "value": N,
   "unit": "images/sec/chip", "vs_baseline": N / 1000}

Baseline: BASELINE.json target of >=1000 600x400 images/sec/chip on v5e.

Method: batched u8-in/u8-out device graph (fused Pallas retinex path on TPU)
with *chained* iterations — each iteration's input is the previous output, so
device work cannot overlap or be skipped — and a single scalar fetch at the
end as the sync point. Rate is computed from the marginal time between a
short and a long chain, which cancels the fixed sync/dispatch latency of the
remote-tunnel setups where block_until_ready is unreliable.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> None:
    # A scalar fetch is a reliable sync point on every backend (including
    # tunneled PJRT where block_until_ready can return early).
    _ = int(x[(0,) * x.ndim])


def _time_chain(step_fn, x0, n: int) -> float:
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = step_fn(x)
    _sync(x)
    return time.perf_counter() - t0


def bench_throughput(
    batch: int = 48,
    h: int = 400,
    w: int = 600,
    repeats: int = 7,
    n_short: int = 8,
    n_long: int = 60,
    method: str = "retinex",
) -> dict:
    """batch 48 measured ~5% faster than 64 (and far better than 128+);
    the long 60-iteration chain keeps the marginal-rate dispersion ~±2%
    where short chains alias tunnel jitter into 2x outliers."""
    from low_light_image_enhancement_tpu.config import PipelineConfig
    from low_light_image_enhancement_tpu.data.synth import synth_batch
    from low_light_image_enhancement_tpu.pipeline import EnhancePipeline

    cfg = PipelineConfig(method=method)
    pipe = EnhancePipeline(cfg)
    lows, _ = synth_batch(min(batch, 8), h, w)
    lows = np.tile(lows, (-(-batch // lows.shape[0]), 1, 1, 1))[:batch]
    dev = jnp.asarray(lows)

    step = pipe.enhance_batch_device
    _sync(step(dev))  # compile
    # Steady-state warmup: run (and discard) one full short+long chain pair.
    # The very first timed chains of a session are otherwise a large outlier
    # (tunnel session setup / allocator warmup — BENCH_r01 rates[0] was 4x).
    _time_chain(step, dev, n_short)
    _time_chain(step, dev, n_long)

    rates = []
    for _ in range(repeats):
        t_short = _time_chain(step, dev, n_short)
        t_long = _time_chain(step, dev, n_long)
        marginal = (t_long - t_short) / (n_long - n_short)
        if marginal > 0:
            rates.append(batch / marginal)
        else:
            # scheduling noise can make the long chain measure faster than
            # the short one on a loaded host; the total-time rate is a
            # positive (if pessimistic, sync cost included) fallback so one
            # bad repeat can't leave rates empty -> NaN median
            rates.append(batch * n_long / max(t_long, 1e-9))
    value = float(np.median(rates))
    from low_light_image_enhancement_tpu.utils.roofline import (
        roofline_report,
    )

    res = {
        "images_per_sec": value,
        "rate_min": float(np.min(rates)),
        "rate_max": float(np.max(rates)),
        "rate_iqr_pct": float(
            100.0 * (np.percentile(rates, 75) - np.percentile(rates, 25))
            / value
        ),
        "batch": batch,
        "backend": jax.default_backend(),
        "rates": [round(r, 1) for r in rates],
    }
    # Roofline placement (VERDICT r3 item 5): achieved TF/s and GB/s vs v5e
    # peaks, and which ceiling binds, from the analytic per-image cost.
    res.update(roofline_report(cfg, h, w, value))
    return res


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=48)
    parser.add_argument("--repeats", type=int, default=7)
    parser.add_argument("--method", default="retinex",
                        help="pipeline method to bench (headline: retinex)")
    parser.add_argument(
        "--watchdog", type=float, default=1200.0,
        help="seconds before an unresponsive backend (e.g. a dead TPU "
             "tunnel, which hangs at device init) aborts with an error "
             "JSON line instead of hanging the caller forever",
    )
    args = parser.parse_args()

    if args.watchdog > 0:
        import os
        import threading

        done = threading.Event()

        def _abort():
            if done.wait(args.watchdog):
                return
            print(json.dumps({
                "metric": "images_per_sec_per_chip_600x400",
                "value": 0.0,
                "unit": "images/sec/chip",
                "vs_baseline": 0.0,
                "error": f"watchdog: backend unresponsive for "
                         f"{args.watchdog:.0f}s (TPU tunnel down?)",
            }), flush=True)
            os._exit(2)

        threading.Thread(target=_abort, daemon=True).start()

    res = bench_throughput(batch=args.batch, repeats=args.repeats,
                           method=args.method)
    if args.watchdog > 0:
        done.set()
    value = res["images_per_sec"]
    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_600x400",
                "value": round(value, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / 1000.0, 4),
                "min": round(res["rate_min"], 2),
                "max": round(res["rate_max"], 2),
                "iqr_pct": round(res["rate_iqr_pct"], 2),
                "n_repeats": len(res["rates"]),
                "achieved_hbm_gbps": res["achieved_hbm_gbps"],
                "achieved_mxu_tflops": res["achieved_mxu_tflops"],
                "hbm_util_pct": res["hbm_util_pct"],
                "mxu_util_pct": res["mxu_util_pct"],
                "vpu_util_pct_est": res["vpu_util_pct_est"],
                "roofline_bound": res["roofline_bound"],
            }
        )
    )
    print(
        f"[bench] backend={res['backend']} batch={res['batch']} "
        f"rates={res['rates']}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
