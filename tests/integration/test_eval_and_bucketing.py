import numpy as np
import jax.numpy as jnp
import pytest

from low_light_image_enhancement_tpu.data.lol import LOLDataset
from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.eval.runner import eval_lol
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline
from low_light_image_enhancement_tpu.utils.debug import checked


def test_eval_lol_report_fields():
    ds = LOLDataset(root="/nonexistent", split="eval15", size=(32, 48))
    rep = eval_lol(dataset=ds, max_images=4, batch_size=2)
    assert rep["n_images"] == 4.0
    assert rep["n_skipped"] == 0.0
    assert rep["parity_within_0p1db"] == 1.0
    assert rep["parity_max_abs_u8"] == 0.0  # jnp vs jnp on CPU


def test_eval_retry_skips_bad_batches(monkeypatch, caplog):
    ds = LOLDataset(root="/nonexistent", split="eval15", size=(32, 48))
    pipe = EnhancePipeline()
    real = pipe.enhance_batch
    calls = {"n": 0}

    def flaky(lows):
        calls["n"] += 1
        if calls["n"] <= 2:  # first batch fails twice -> skipped
            raise RuntimeError("injected device fault")
        return real(lows)

    monkeypatch.setattr(pipe, "enhance_batch", flaky)
    rep = eval_lol(pipe, dataset=ds, max_images=4, batch_size=2, parity=False)
    assert rep["n_skipped"] == 2.0
    assert rep["n_images"] == 2.0


def test_bucketing_bit_identical_and_caches():
    lows, _ = synth_batch(2, 50, 70)
    exact = EnhancePipeline().enhance_batch(lows)
    bucketed_pipe = EnhancePipeline(bucket=64)
    bucketed = bucketed_pipe.enhance_batch(lows)
    np.testing.assert_array_equal(exact, bucketed)
    # a second, different size in the same bucket reuses the compiled fn
    lows2, _ = synth_batch(2, 61, 70)
    bucketed_pipe.enhance_batch(lows2)
    assert len(bucketed_pipe._cache) == 1


def test_checked_catches_nan():
    f = checked(lambda x: jnp.log(x))
    assert float(f(jnp.asarray([1.0]))[0]) == 0.0
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))  # log(-1) = nan -> throws
