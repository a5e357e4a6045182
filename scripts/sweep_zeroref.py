#!/usr/bin/env python
"""Zero-reference training rehabilitation sweep (VERDICT r2 item 3).

The config-3 zero-reference (Zero-DCE) recipe scored SSIM 0.10 on the
round-2 hardened synthetic eval set while the paired objective reached
0.60, so the shipped curve weights quietly switched objective. This sweep
searches the zero-reference loss space (exposure target, spatial-
consistency weight, exposure weight, map-TV weight) for a recipe that at
least beats the classical retinex path (SSIM 0.32), or records the
measured negative.

Each candidate trains briefly on-device on the hardened synthetic stream
and is scored on the synthetic eval-15 (PSNR/SSIM, no parity pass). One
JSON line per candidate; `--steps` sets the budget (default 600 — enough
to rank recipes; rerun the winner with --steps 2000+ to confirm).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from low_light_image_enhancement_tpu.config import PipelineConfig  # noqa: E402
from low_light_image_enhancement_tpu.data.synth_device import (  # noqa: E402
    synth_batch_iter,
)
from low_light_image_enhancement_tpu.eval.runner import eval_lol  # noqa: E402
from low_light_image_enhancement_tpu.pipeline import (  # noqa: E402
    EnhancePipeline,
)
from low_light_image_enhancement_tpu.train import (  # noqa: E402
    TrainConfig,
    init_train_state,
    make_train_step,
)

# (name, exposure_level, w_exposure, w_spatial, w_smooth)
GRID = [
    ("baseline-zdce", 0.60, 10.0, 1.0, 200.0),
    ("level45", 0.45, 10.0, 1.0, 200.0),
    ("level35", 0.35, 10.0, 1.0, 200.0),
    ("spatial20", 0.60, 10.0, 20.0, 200.0),
    ("level45-spatial20", 0.45, 10.0, 20.0, 200.0),
    ("level45-spatial20-tv800", 0.45, 10.0, 20.0, 800.0),
    ("level45-exp5-spatial20", 0.45, 5.0, 20.0, 200.0),
    ("level50-spatial50-tv400", 0.50, 10.0, 50.0, 400.0),
]


def run_candidate(name, level, w_exp, w_spa, w_tv, steps, batch, crop):
    tcfg = TrainConfig(
        batch_size=batch, crop=crop, steps=steps,
        exposure_level=level, w_exposure=w_exp, w_spatial=w_spa,
        w_smooth=w_tv,
    )
    params, opt_state = init_train_state(tcfg, seed=0)
    step = make_train_step(tcfg)
    data = synth_batch_iter(batch, crop, crop, seed=0)
    t0 = time.time()
    loss = None
    for i in range(steps):
        low, _ = next(data)
        params, opt_state, m = step(params, opt_state, low)
        loss = float(m["loss"])
    train_s = time.time() - t0

    cfg = PipelineConfig(method="curve")
    rep = eval_lol(
        pipeline=EnhancePipeline(cfg, model_params=params),
        parity=False,
    )
    return params, {
        "name": name, "exposure_level": level, "w_exposure": w_exp,
        "w_spatial": w_spa, "w_smooth": w_tv, "steps": steps,
        "final_loss": round(loss, 4), "train_s": round(train_s, 1),
        "psnr": round(rep["psnr_mean"], 2),
        "ssim": round(rep["ssim_mean"], 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--only", default=None,
                    help="run a single named candidate")
    ap.add_argument("--save", default=None,
                    help="save the candidate's weights to this .npz")
    args = ap.parse_args()

    grid = [g for g in GRID if args.only in (None, g[0])]
    best = None
    for name, level, w_exp, w_spa, w_tv in grid:
        params, row = run_candidate(
            name, level, w_exp, w_spa, w_tv, args.steps, args.batch,
            args.crop,
        )
        print(json.dumps(row), flush=True)
        if best is None or row["ssim"] > best[1]["ssim"]:
            best = (params, row)
    if best and args.save:
        from low_light_image_enhancement_tpu.models.weights import (
            save_params,
        )

        save_params(best[0], args.save)
        print(f"saved {best[1]['name']} -> {args.save}", flush=True)
    if best:
        print(f"# best: {best[1]['name']} ssim={best[1]['ssim']} "
              f"(classical retinex baseline: ssim 0.32)", flush=True)


if __name__ == "__main__":
    main()
