import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_pair
from low_light_image_enhancement_tpu.models.fcn import apply_fcn, init_fcn
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline
from low_light_image_enhancement_tpu.train import (
    TrainConfig,
    make_supervised_train_step,
    make_optimizer,
    train_fcn,
)


def test_fcn_shapes_and_range():
    params = init_fcn(jax.random.PRNGKey(0), features=8, depth=4)
    x = jnp.asarray(np.random.default_rng(0).random((2, 3, 16, 24), np.float32))
    y = apply_fcn(params, x)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_fcn_receptive_field_grows_with_dilation():
    """A distant pixel must influence the output (dilated convs aggregate a
    large context)."""
    params = init_fcn(jax.random.PRNGKey(1), features=8, depth=5)
    x = jnp.zeros((1, 3, 33, 64), jnp.float32)
    y0 = apply_fcn(params, x)
    x2 = x.at[:, :, 0, 0].set(1.0)
    y2 = apply_fcn(params, x2)
    # effect reaches >= 16 pixels away (dilations 1+2+4+8 + final)
    delta = np.abs(np.asarray(y2 - y0))[0, :, 16, 16].max()
    assert delta > 0


def test_fcn_pipeline_method():
    cfg = PipelineConfig(method="fcn")
    pipe = EnhancePipeline(cfg, rng_seed=0)
    low, _ = synth_pair(0, 40, 64)
    out = pipe.enhance(low)
    assert out.shape == low.shape and out.dtype == np.uint8


def test_supervised_step_reduces_loss():
    tcfg = TrainConfig(features=8, batch_size=2, crop=32, steps=1)
    params = init_fcn(jax.random.PRNGKey(0), features=8, depth=4)
    opt_state = make_optimizer(tcfg).init(params)
    step = make_supervised_train_step(tcfg)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.random((2, 3, 24, 24), np.float32) * 0.3)
    high = jnp.clip(low * 3.0, 0, 1)
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, low, high)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_train_fcn_loop_runs():
    tcfg = TrainConfig(features=8, batch_size=2, crop=32, steps=3,
                       log_every=1)
    params, hist = train_fcn(tcfg)
    assert len(hist) == 3
    assert np.isfinite(hist[-1]["loss"])
