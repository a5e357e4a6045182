import os

import jax.numpy as jnp

from low_light_image_enhancement_tpu.utils.profiling import profile_trace, stage


def test_profile_trace_writes_artifacts(tmp_path):
    d = str(tmp_path / "trace")
    with profile_trace(d):
        with stage("tiny-op"):
            _ = float((jnp.ones((64, 64)) * 2).sum())
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no profiler artifacts written"


def test_stage_is_transparent():
    with stage("noop"):
        x = jnp.arange(4.0) + 1
    assert float(x.sum()) == 10.0
