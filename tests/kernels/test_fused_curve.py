"""Parity of the fused curve/hybrid tail kernel (interpret mode) vs the
pure-jnp block path — the kernel-vs-reference mechanism of SURVEY.md §4."""

import jax.numpy as jnp
import numpy as np
import pytest

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


@pytest.mark.parametrize("method", ["curve", "hybrid"])
@pytest.mark.parametrize("size", [(64, 96), (33, 47), (96, 200)])
def test_fused_curve_pipeline_parity_u8(method, size):
    h, w = size
    lows, _ = synth_batch(2, h, w)
    cfg = PipelineConfig(method=method)
    ref = EnhancePipeline(cfg, force_jnp=True)
    fused = EnhancePipeline(cfg, pallas_interpret=True,
                            model_params=ref.model_params)
    got, want = fused.enhance_batch(lows), ref.enhance_batch(lows)
    # Last-ulp f32 fusion differences across jit contexts flip isolated u8
    # rounding ties (<0.1% pixels) — hybrid via the exp/log boost chain,
    # curve via the full-strength denoise tail (at strength=1.0 the output
    # IS the filtered value, so its tap-accumulation order decides the
    # quantize tie directly; measured 1 px / 115,200 at 96x200). Same
    # tolerance as the sharded parity tests.
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3, (d.max(), (d > 0).mean())


def test_fused_curve_no_denoise_and_downsample():
    lows, _ = synth_batch(1, 48, 80)
    for cfg in (
        PipelineConfig(method="curve", denoise_strength=0.0),
        PipelineConfig(method="curve", curve_downsample=2),
        PipelineConfig(method="curve", curve_downsample=4),
        PipelineConfig(method="hybrid", curve_downsample=4),
    ):
        ref = EnhancePipeline(cfg, force_jnp=True)
        fused = EnhancePipeline(cfg, pallas_interpret=True,
                                model_params=ref.model_params)
        np.testing.assert_array_equal(fused.enhance_batch(lows),
                                      ref.enhance_batch(lows))


def test_fused_curve_f32_blocks():
    """f32 block in -> f32 out through the fused tail (sharded-path dtype)."""
    from low_light_image_enhancement_tpu.blocks import (
        block_geometry,
        enhance_learned_block,
        learned_halo,
    )
    from low_light_image_enhancement_tpu.config import MARGIN

    cfg = PipelineConfig(method="curve")
    pipe = EnhancePipeline(cfg, force_jnp=True)
    rng = np.random.default_rng(0)
    h, w = 40, 56
    halo = learned_halo(cfg)
    h_core, wp = block_geometry(cfg, h, w)
    x = jnp.asarray(rng.random((1, 3, h, w), np.float32))
    xb = jnp.pad(
        x, ((0, 0), (0, 0), (halo, halo + h_core - h),
            (MARGIN, wp - w - MARGIN)),
        mode="edge",
    )
    args = dict(cfg=cfg, model_params=pipe.model_params, row0=-halo, h=h, w=w)
    got = enhance_learned_block(xb, use_pallas=True, interpret=True, **args)
    want = enhance_learned_block(xb, use_pallas=False, **args)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("impl", ["packed", "packed12"])
def test_fused_tail_with_packed_cnn_impls(impl):
    """The block-conv CNN impls compose with the fused tail (interpret
    mode) — the combination a TPU user gets when the auto policy routes
    small/mid batches to a packing. f32 conv compute pins the comparison
    (same as the sharding tie-rate tests: under the bf16 default the
    packing's contraction reorder flips ~20% of pixels by 1 u8 step,
    which is fine visually but not a parity statement); remaining
    divergence is isolated u8 rounding ties."""
    lows, _ = synth_batch(2, 48, 80)
    cfg = PipelineConfig(method="curve", conv_impl=impl,
                         compute_dtype="float32")
    ref = EnhancePipeline(cfg.replace(conv_impl="xla"), force_jnp=True)
    fused = EnhancePipeline(cfg, pallas_interpret=True,
                            model_params=ref.model_params)
    got, want = fused.enhance_batch(lows), ref.enhance_batch(lows)
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3, (impl, d.max())
