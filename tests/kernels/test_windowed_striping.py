"""Windowed striping (round 5, VERDICT r4 item 8): element-offset input
windows off the padded canvas must be bit-identical to the round-4
extract_stripes/merge_stripes form on every kernel that stripes — the two
XLA full-canvas copy passes are pure data movement, so removing them can
change nothing but time.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.kernels.striping import plan_stripes
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


def _ab(cfg_kw, h=100, w=72, b=2):
    lows, _ = synth_batch(b, h, w)
    out = []
    for windowed in (True, False):
        cfg = PipelineConfig(stripe_windowed=windowed, **cfg_kw)
        # stripe_rows=16 forces several overlapping windows even at test
        # sizes, so the window schedule (not just S=1) is exercised
        pipe = EnhancePipeline(cfg, pallas_interpret=True)
        out.append(pipe.enhance_batch(lows))
    return out


@pytest.mark.parametrize("cfg_kw", [
    dict(stripe_rows=16),                                   # retinex
    dict(stripe_rows=16, denoise_taps="guided"),            # guided tail
    dict(stripe_rows=16, method="curve", curve_downsample=2),
    dict(stripe_rows=16, method="hybrid", curve_downsample=4),
    dict(stripe_rows=16, method="fcn"),                     # tiled denoise
])
def test_windowed_matches_stripes_form(cfg_kw):
    a, b = _ab(cfg_kw)
    np.testing.assert_array_equal(a, b)


def test_windowed_multi_stripe_plan_actually_stripes():
    cfg = PipelineConfig(stripe_rows=16)
    plan = plan_stripes(100, 72, 4, cfg.stripe_rows)
    assert plan.n_stripes > 1  # the parity above covered >1 window


def test_windowed_video_ema_matches_stripes_form():
    from low_light_image_enhancement_tpu.video import VideoEnhancer

    rng = np.random.default_rng(0)
    frames = [(rng.random((64, 72, 3)) * 80).astype(np.uint8)
              for _ in range(3)]
    outs = []
    for windowed in (True, False):
        cfg = PipelineConfig(stripe_windowed=windowed, stripe_rows=16)
        ve = VideoEnhancer(cfg, alpha=0.3, pallas_interpret=True)
        outs.append([ve.process(f) for f in frames])
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)
