import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.parallel import make_mesh
from low_light_image_enhancement_tpu.train import (
    TrainConfig,
    init_train_state,
    make_train_step,
    train_curve_cnn,
    zero_reference_loss,
)

_TINY = TrainConfig(
    features=8, n_iter=2, batch_size=4, crop=32, steps=6, log_every=2,
    checkpoint_every=1000,
)


def _batch(tcfg, seed=0):
    lows, _ = synth_batch(tcfg.batch_size, tcfg.crop, tcfg.crop, seed=seed)
    return jnp.transpose(jnp.asarray(lows, jnp.float32) / 255.0, (0, 3, 1, 2))


def test_loss_finite_and_components():
    params, _ = init_train_state(_TINY)
    total, metrics = zero_reference_loss(params, _batch(_TINY), _TINY)
    assert np.isfinite(float(total))
    for k in ("exposure", "color", "spatial", "smooth"):
        assert float(metrics[k]) >= 0.0


def test_train_step_reduces_loss():
    params, opt_state = init_train_state(_TINY)
    step = make_train_step(_TINY)
    batch = _batch(_TINY)
    losses = []
    for _ in range(15):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_train_step_sharded_matches_single_device():
    mesh = make_mesh(n_data=8)
    params, opt_state = init_train_state(_TINY)
    batch = _batch(_TINY.replace(batch_size=8) if hasattr(_TINY, "replace")
                   else _TINY, seed=1)
    import dataclasses
    tcfg8 = dataclasses.replace(_TINY, batch_size=8)
    batch = _batch(tcfg8, seed=1)

    single = make_train_step(tcfg8)
    sharded = make_train_step(tcfg8, mesh)
    p1, _, m1 = single(params, opt_state, batch)
    p2, _, m2 = sharded(params, opt_state, batch)
    # Relative tolerance: sharded evaluation sums the (w_smooth-1600-scaled
    # since the round-3 swept recipe) loss terms in a different f32
    # reduction order, which moves the scalar by a few dozen ulps (measured
    # 3e-6 relative); the weight assertion below stays the tight check.
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    w1 = np.asarray(p1["c1"]["w"])
    w2 = np.asarray(p2["c1"]["w"])
    np.testing.assert_allclose(w1, w2, atol=1e-6)


def test_train_loop_with_checkpoint_resume(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    import dataclasses
    tcfg = dataclasses.replace(_TINY, steps=4, checkpoint_every=2)
    params, hist = train_curve_cnn(tcfg, checkpoint_dir=ckpt_dir)
    assert hist and np.isfinite(hist[-1]["loss"])

    # resume continues from the saved step without error
    tcfg2 = dataclasses.replace(tcfg, steps=6)
    params2, hist2 = train_curve_cnn(
        tcfg2, checkpoint_dir=ckpt_dir, resume=True
    )
    assert hist2[0]["step"] >= 4
