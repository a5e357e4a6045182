#!/usr/bin/env python
"""LOL eval-15 script (BASELINE.json: "dataset eval scripts").

Thin wrapper over ``eval.runner.eval_lol``; prints the JSON report.
Usage: python scripts/eval_lol.py [--data-dir DIR] [--max-images N]
       [--method retinex|curve|hybrid|fcn] [--no-parity] [--profile DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--split", default="eval15")
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--method", default="retinex")
    ap.add_argument("--no-parity", action="store_true")
    ap.add_argument("--profile", default=None,
                    help="capture a jax.profiler trace into this dir")
    args = ap.parse_args()

    from low_light_image_enhancement_tpu.config import PipelineConfig
    from low_light_image_enhancement_tpu.data.lol import LOLDataset
    from low_light_image_enhancement_tpu.eval.runner import eval_lol
    from low_light_image_enhancement_tpu.pipeline import EnhancePipeline
    from low_light_image_enhancement_tpu.utils.profiling import profile_trace

    ds = LOLDataset(root=args.data_dir, split=args.split)
    pipe = EnhancePipeline(PipelineConfig(method=args.method))

    def run():
        return eval_lol(pipe, ds, max_images=args.max_images,
                        parity=not args.no_parity)

    if args.profile:
        with profile_trace(args.profile):
            report = run()
    else:
        report = run()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
