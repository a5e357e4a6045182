import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_pair
from low_light_image_enhancement_tpu.models.decom import init_decom_net
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline
from low_light_image_enhancement_tpu.train import (
    TrainConfig,
    decom_loss,
    make_decom_train_step,
    make_optimizer,
)


def _pair(b=2, s=32, seed=0):
    rng = np.random.default_rng(seed)
    low = jnp.asarray(rng.random((b, 3, s, s), np.float32) * 0.25)
    high = jnp.clip(low * 4.0, 0, 1)
    return low, high


def test_decom_loss_finite_components():
    params = init_decom_net(jax.random.PRNGKey(0), features=8)
    low, high = _pair()
    total, m = decom_loss(params, low, high, TrainConfig())
    assert np.isfinite(float(total))
    for k in ("recon", "equal_r", "smooth"):
        assert float(m[k]) >= 0


def test_decom_training_improves_reconstruction():
    tcfg = TrainConfig(features=8, batch_size=2, crop=32, steps=1,
                       learning_rate=2e-3)
    params = init_decom_net(jax.random.PRNGKey(0), features=8)
    opt_state = make_optimizer(tcfg).init(params)
    step = make_decom_train_step(tcfg)
    low, high = _pair()
    recons = []
    for _ in range(40):
        params, opt_state, m = step(params, opt_state, low, high)
        recons.append(float(m["recon"]))
    assert recons[-1] < recons[0] * 0.85


def test_decom_pipeline_method():
    pipe = EnhancePipeline(PipelineConfig(method="decom"), rng_seed=0)
    low, _ = synth_pair(0, 40, 64)
    out = pipe.enhance(low)
    assert out.shape == low.shape and out.dtype == np.uint8
