"""Evaluation: jittable PSNR/SSIM metrics and the LOL eval harness."""

from low_light_image_enhancement_tpu.eval.metrics import (
    delta_e76,
    psnr,
    rgb_to_lab,
    ssim,
)
from low_light_image_enhancement_tpu.eval.runner import eval_lol

__all__ = ["psnr", "ssim", "delta_e76", "rgb_to_lab", "eval_lol"]
