"""LOL eval harness (BASELINE.json config 2) with device-vs-reference parity.

``eval_lol`` runs the pipeline over the eval split, reports mean PSNR/SSIM of
enhanced-vs-ground-truth, and — when ``parity=True`` — re-runs the pure-jnp
reference path on the same inputs and reports the PSNR between the two
outputs plus the max absolute u8 delta. The >=(infinity) parity PSNR /
<=0.1 dB budget (BASELINE.json:5) is checked against the *difference of the
two paths' GT-PSNRs*.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from low_light_image_enhancement_tpu.data.lol import LOLDataset
from low_light_image_enhancement_tpu.eval.metrics import psnr_u8, ssim_u8
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


def eval_lol(
    pipeline: Optional[EnhancePipeline] = None,
    dataset: Optional[LOLDataset] = None,
    max_images: Optional[int] = None,
    parity: bool = True,
) -> Dict[str, float]:
    pipeline = pipeline or EnhancePipeline()
    dataset = dataset or LOLDataset(split="eval15")
    lows, highs = dataset.as_batch(max_images)

    out = pipeline.enhance_batch(lows)
    psnrs = np.asarray(psnr_u8(out, highs))
    ssims = np.asarray(ssim_u8(out, highs))
    report: Dict[str, float] = {
        "n_images": float(len(lows)),
        "synthetic_data": float(dataset.is_synthetic),
        "psnr_mean": float(psnrs.mean()),
        "psnr_std": float(psnrs.std()),
        "ssim_mean": float(ssims.mean()),
    }

    if parity:
        ref_pipe = EnhancePipeline(
            pipeline.config, curve_params=pipeline.curve_params, force_jnp=True
        )
        ref = ref_pipe.enhance_batch(lows)
        ref_psnrs = np.asarray(psnr_u8(ref, highs))
        report["ref_psnr_mean"] = float(ref_psnrs.mean())
        report["parity_psnr_delta_db"] = float(
            abs(psnrs.mean() - ref_psnrs.mean())
        )
        report["parity_max_abs_u8"] = float(
            np.max(np.abs(out.astype(np.int32) - ref.astype(np.int32)))
        )
        report["parity_within_0p1db"] = float(
            report["parity_psnr_delta_db"] <= 0.1
        )
    return report
