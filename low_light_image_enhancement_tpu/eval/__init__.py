"""Evaluation: jittable PSNR/SSIM metrics and the LOL eval harness."""

from low_light_image_enhancement_tpu.eval.metrics import psnr, ssim
from low_light_image_enhancement_tpu.eval.runner import eval_lol

__all__ = ["psnr", "ssim", "eval_lol"]
