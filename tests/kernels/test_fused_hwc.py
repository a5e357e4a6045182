"""Interleaved-HWC kernel parity: must reproduce the planar u8 pipeline
bit-exactly (same taps, order, quantization — only the layout differs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.kernels.fused_enhance_hwc import (
    enhance_hwc_u8,
)
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


@pytest.mark.parametrize("h,w", [(40, 72), (64, 100), (33, 47)])
def test_hwc_kernel_bit_exact_vs_planar_pipeline(h, w):
    # the experimental interleaved kernel implements only the per-channel
    # bilateral (it predates the luma guide and is a kept negative result)
    cfg = PipelineConfig(denoise_guide="perchannel", denoise_taps="full")
    lows, _ = synth_batch(2, h, w)
    got = np.asarray(enhance_hwc_u8(jnp.asarray(lows), cfg, interpret=True))
    want = EnhancePipeline(cfg, pallas_interpret=True).enhance_batch(lows)
    np.testing.assert_array_equal(got, want)


def test_hwc_kernel_no_denoise():
    cfg = PipelineConfig(denoise_strength=0.0)
    lows, _ = synth_batch(1, 32, 48)
    got = np.asarray(enhance_hwc_u8(jnp.asarray(lows), cfg, interpret=True))
    want = EnhancePipeline(cfg, pallas_interpret=True).enhance_batch(lows)
    np.testing.assert_array_equal(got, want)
