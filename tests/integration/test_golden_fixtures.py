"""Golden-fixture integration test (SURVEY.md §4): tiny LOL-like PNG pairs
committed under tests/data/; enhancing the lows must reproduce the stored
PSNR/SSIM against the highs within the 0.1 dB fidelity budget
(BASELINE.json:5)."""

import json
from pathlib import Path

import jax.numpy as jnp

from low_light_image_enhancement_tpu.eval.metrics import psnr_u8, ssim_u8
from low_light_image_enhancement_tpu.io.codec import decode_image
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline

DATA = Path(__file__).parent.parent / "data"


def test_golden_pairs_within_budget():
    expected = json.loads((DATA / "expected_metrics.json").read_text())
    pipe = EnhancePipeline()
    for name, exp in expected.items():
        low = decode_image(DATA / f"{name}_low.png")
        high = decode_image(DATA / f"{name}_high.png")
        out = pipe.enhance(low)
        psnr = float(psnr_u8(jnp.asarray(out), jnp.asarray(high)))
        ssim = float(ssim_u8(jnp.asarray(out)[None], jnp.asarray(high)[None])[0])
        assert abs(psnr - exp["psnr_db"]) <= 0.1, (name, psnr, exp)
        assert abs(ssim - exp["ssim"]) <= 0.005, (name, ssim, exp)
