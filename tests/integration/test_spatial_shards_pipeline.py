"""spatial_shards config routes EnhancePipeline through the sharded path and
matches the single-device pipeline bit-exactly."""

import numpy as np

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


def test_spatial_shards_pipeline_matches_single_device_jnp():
    lows, _ = synth_batch(2, 64, 96)
    single = EnhancePipeline(PipelineConfig(), force_jnp=True)
    sharded = EnhancePipeline(
        PipelineConfig(spatial_shards=4), force_jnp=True
    )
    a = single.enhance_batch(lows)
    b = sharded.enhance_batch(lows)
    assert ("sharded", 2, 64, 96) in sharded._cache
    np.testing.assert_array_equal(a, b)


def test_spatial_shards_pipeline_u8_pallas_interpret():
    lows, _ = synth_batch(1, 48, 80)
    single = EnhancePipeline(PipelineConfig(), pallas_interpret=True)
    sharded = EnhancePipeline(
        PipelineConfig(spatial_shards=2), pallas_interpret=True
    )
    np.testing.assert_array_equal(
        single.enhance_batch(lows), sharded.enhance_batch(lows)
    )
