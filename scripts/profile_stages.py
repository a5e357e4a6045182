#!/usr/bin/env python
"""Per-stage device time of the fused enhance path (VERDICT r1 item 4).

Two methods, most-reliable first:

1. **Truncated-kernel differencing** (works through the axon tunnel, where
   block_until_ready lies and profiler traces may not return): compile the
   fused kernel with stages progressively enabled — memcpy-only (u8 in ->
   normalize -> quantize -> u8 out), +illumination blur, +gamma boost,
   +bilateral denoise — and difference the chained-iteration marginal times.
   Each delta is that stage's device cost; the memcpy floor gives achieved
   HBM bandwidth; the gap between the staged kernel and the full pipeline
   call is the HWC<->planar transpose + stripe-overlap overhead.

2. **jax.profiler trace** (attempted; may yield nothing on tunneled PJRT):
   writes a TensorBoard trace under --trace-dir for offline inspection.

Prints one JSON line with per-stage microseconds per image and derived
bandwidth/roofline numbers.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> None:
    # Fetch ONE element, not the array: a 46 MB batch readback through the
    # tunnel costs seconds with multi-second variance, which would swamp the
    # short-vs-long chain marginal this script differences.
    _ = np.asarray(x[(0,) * getattr(x, "ndim", 0)])


def _chain_time(step, x0, n: int) -> float:
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = step(x)
    _sync(x)
    return time.perf_counter() - t0


def _marginal(step, x0, ns=4, nl=60, reps=7) -> float:
    """Seconds per iteration, fixed dispatch latency cancelled."""
    _chain_time(step, x0, ns)
    _chain_time(step, x0, nl)
    vals = []
    for _ in range(reps):
        ts, tl = _chain_time(step, x0, ns), _chain_time(step, x0, nl)
        if tl > ts:
            vals.append((tl - ts) / (nl - ns))
    return float(np.median(vals))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, nargs=2, default=(400, 600))
    ap.add_argument("--trace-dir", default=None,
                    help="also attempt a jax.profiler trace into this dir")
    args = ap.parse_args()

    from low_light_image_enhancement_tpu.config import MARGIN, PipelineConfig
    from low_light_image_enhancement_tpu.data.synth import synth_batch
    from low_light_image_enhancement_tpu.kernels.fused_enhance import (
        fused_retinex,
    )
    from low_light_image_enhancement_tpu.kernels.striping import plan_stripes
    from low_light_image_enhancement_tpu.pipeline import EnhancePipeline

    h, w = args.size
    b = args.batch
    cfg = PipelineConfig()
    plan = plan_stripes(h, w, MARGIN, cfg.stripe_rows)
    lows, _ = synth_batch(min(b, 8), h, w)
    lows = np.tile(lows, (-(-b // lows.shape[0]), 1, 1, 1))[:b]
    # pre-padded planar u8 canvas: isolates the kernel from the transposes
    xpu = jnp.asarray(
        np.pad(np.transpose(lows, (0, 3, 1, 2)),
               ((0, 0), (0, 0),
                (MARGIN, plan.padded_h - h - MARGIN),
                (MARGIN, plan.padded_w - w - MARGIN)),
               mode="edge")
    )

    variants = [
        ("memcpy", ()),                              # normalize+quantize only
        ("blur", ("blur",)),
        ("boost", ("blur", "boost")),
        ("denoise", ("blur", "boost", "denoise")),
    ]
    per_iter = {}
    for name, stages in variants:
        # scalar carry: forces each dispatch to complete and be observed
        # (the pallas call is opaque to XLA, so it cannot be elided), adds
        # one element of readback per chain end, ~zero extra device work
        fn = jax.jit(
            lambda v, s=stages: v + fused_retinex(
                xpu, cfg, plan, stages=s
            )[0, 0, 0, 0].astype(jnp.int32)
        )
        per_iter[name] = _marginal(fn, jnp.zeros((), jnp.int32))

    # full pipeline (adds HWC->planar transposes + pad/crop around the kernel)
    pipe = EnhancePipeline(cfg)
    dev = jnp.asarray(lows)
    _sync(pipe.enhance_batch_device(dev))
    per_iter["pipeline"] = _marginal(pipe.enhance_batch_device, dev)

    us = {k: v / b * 1e6 for k, v in per_iter.items()}
    stage_us = {
        "memcpy_normalize_quantize": round(us["memcpy"], 2),
        "illumination_blur": round(us["blur"] - us["memcpy"], 2),
        "gamma_boost": round(us["boost"] - us["blur"], 2),
        "bilateral_denoise": round(us["denoise"] - us["boost"], 2),
        "transpose_pad_crop": round(us["pipeline"] - us["denoise"], 2),
        "total_pipeline": round(us["pipeline"], 2),
    }
    # HBM traffic of the memcpy variant: read + write of 3 u8 canvas planes
    # per image, times the stripe-overlap read amplification of the plan
    # (1.0 when the whole image is one stripe, as at 600x400).
    canvas_px = plan.padded_h * plan.padded_w
    amp = (plan.stripe_rows + 2 * plan.margin) / plan.stripe_rows \
        if plan.n_stripes > 1 else 1.0
    bytes_per_img = int(canvas_px * 3 * (1 + amp))
    gbps = bytes_per_img / (us["memcpy"] * 1e-6) / 1e9
    result = {
        "metric": "per_stage_device_time",
        "method": "truncated-kernel differencing (see script docstring)",
        "batch": b,
        "resolution": f"{h}x{w}",
        "stage_us_per_image": stage_us,
        "memcpy_achieved_GBps": round(gbps, 1),
        "images_per_sec_pipeline": round(b / per_iter["pipeline"], 1),
        "backend": jax.default_backend(),
    }

    if args.trace_dir:
        try:
            with jax.profiler.trace(args.trace_dir):
                for _ in range(3):
                    out = pipe.enhance_batch_device(dev)
                _sync(out)
            trace_files = [str(p) for p in
                           Path(args.trace_dir).rglob("*") if p.is_file()]
            result["trace_files"] = trace_files[:8]
        except Exception as e:
            result["trace_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
