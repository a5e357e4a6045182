"""Guided-tail quality + throughput rows (VERDICT r3 item 3).

Quality: eval-15 (synthetic stand-in) through the REAL pipeline per tail
variant. Throughput: the headline 600x400 chained protocol per variant.
Prints one JSON line per row. Run alone on the real chip.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import json
import time

import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.eval.runner import eval_lol
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


def _sync(x):
    _ = int(x[(0,) * x.ndim])


def rate(cfg, batch=48, repeats=5, n_short=8, n_long=60):
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


def main():
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
        r = rate(cfg)
        print(json.dumps({
            "row": name,
            "psnr": round(rep["psnr_mean"], 2),
            "ssim": round(rep["ssim_mean"], 3),
            "delta_e76": round(rep["delta_e76_mean"], 1),
            "parity_max_u8": rep.get("parity_max_abs_u8"),
            "img_per_sec_b48": round(r, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
