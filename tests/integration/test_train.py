import jax
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


def test_denoise_in_loss_applies_shipping_tail():
    """denoise_in_loss=True (the shipped hybrid/curve recipe, round 4)
    compares AFTER the pipeline's denoise tail: the loss value must move
    vs the plain objective, match hand-applying the tail, and stay
    differentiable — for BOTH the curve and fcn paired losses."""
    from low_light_image_enhancement_tpu.train import (
        _denoise_tail,
        paired_curve_loss,
        paired_loss,
    )

    tcfg = _TINY
    tcfg_dnl = TrainConfig(**{**tcfg.__dict__, "denoise_in_loss": True})
    low = _batch(tcfg)
    high = jnp.clip(low * 2.0, 0.0, 1.0)

    params, _ = init_train_state(tcfg)
    base, _ = paired_curve_loss(params, low, high, tcfg)
    dnl, _ = paired_curve_loss(params, low, high, tcfg_dnl)
    assert np.isfinite(float(dnl)) and float(dnl) != float(base)
    g = jax.grad(lambda p: paired_curve_loss(p, low, high, tcfg_dnl)[0])(
        params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    # hand-applied tail on the plain-enhanced output reproduces the dnl L1
    from low_light_image_enhancement_tpu.models.curve_cnn import (
        apply_curve_cnn,
    )
    from low_light_image_enhancement_tpu.ops.curves import apply_curves

    a = apply_curve_cnn(params, low, n_iter=tcfg.n_iter)
    y = _denoise_tail(jnp.clip(apply_curves(low, a), 0.0, 1.0))
    _, m = paired_curve_loss(params, low, high, tcfg_dnl)
    np.testing.assert_allclose(float(m["l1"]),
                               float(jnp.mean(jnp.abs(y - high))),
                               rtol=2e-4)

    from low_light_image_enhancement_tpu.models.fcn import init_fcn

    fparams = init_fcn(jax.random.PRNGKey(0), features=8)
    fbase, _ = paired_loss(fparams, low, high, tcfg)
    fdnl, _ = paired_loss(fparams, low, high, tcfg_dnl)
    assert np.isfinite(float(fdnl)) and float(fdnl) != float(fbase)


def test_eval_early_stop_returns_best_snapshot():
    """eval_every>0 + eval_fn: the loop stops after eval_patience
    non-improving evals and returns the BEST-scoring params, not the
    last (VERDICT r3 weak #4 — the zero-ref 600-step stop, mechanized)."""
    from low_light_image_enhancement_tpu.train import train_curve_cnn

    tcfg = TrainConfig(**{**_TINY.__dict__, "steps": 40, "eval_every": 5,
                          "eval_patience": 2})
    calls = []
    # scripted metric: improves for 3 evals, then degrades forever
    scores = [0.1, 0.2, 0.3, 0.25, 0.2, 0.15, 0.1, 0.05]

    def fake_eval(params):
        calls.append(jax.tree_util.tree_map(np.asarray, params))
        return scores[len(calls) - 1]

    params, history = train_curve_cnn(tcfg, eval_fn=fake_eval)
    # stopped after the 5th eval (patience 2 past the peak at #3): 25 steps
    assert len(calls) == 5, len(calls)
    evals = [h for h in history if "eval_score" in h]
    assert [e["eval_score"] for e in evals] == scores[:5]
    # returned params are the peak-score snapshot (eval #3), not the last
    best = calls[2]
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(best)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zeroref_denoise_in_loss_changes_objective():
    tcfg_dnl = TrainConfig(**{**_TINY.__dict__, "denoise_in_loss": True})
    params, _ = init_train_state(_TINY)
    batch = _batch(_TINY)
    base, _ = zero_reference_loss(params, batch, _TINY)
    dnl, _ = zero_reference_loss(params, batch, tcfg_dnl)
    assert np.isfinite(float(dnl)) and float(dnl) != float(base)


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


def test_ema_weights_tracked_and_resumed(tmp_path):
    """ema_decay: the loop returns EMA weights (lagging the raw params),
    checkpoints them, and a resume restores the EMA tree."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from low_light_image_enhancement_tpu.train import (
        TrainConfig,
        train_fcn,
    )

    base = TrainConfig(features=8, batch_size=2, crop=32, steps=3,
                       checkpoint_every=2)
    raw, _ = train_fcn(dataclasses.replace(base, ema_decay=None), seed=5)
    ema, _ = train_fcn(dataclasses.replace(base, ema_decay=0.5), seed=5)
    # same data/seed: EMA lags the raw trajectory -> different weights,
    # but same tree structure and all finite
    assert jax.tree_util.tree_structure(raw) == \
        jax.tree_util.tree_structure(ema)
    dw = float(jnp.abs(raw["c1"]["w"] - ema["c1"]["w"]).max())
    assert dw > 0, "EMA should lag the raw weights"
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(ema))

    # checkpointed EMA resumes: run 2 steps, resume to 3, matches the
    # straight 3-step EMA run
    ck = tmp_path / "ck"
    p2, _ = train_fcn(
        dataclasses.replace(base, steps=2, ema_decay=0.5), seed=5,
        checkpoint_dir=str(ck),
    )
    p3, _ = train_fcn(
        dataclasses.replace(base, steps=3, ema_decay=0.5), seed=5,
        checkpoint_dir=str(ck), resume=True,
    )
    np.testing.assert_allclose(
        np.asarray(p3["c1"]["w"]), np.asarray(ema["c1"]["w"]), atol=1e-6
    )


def test_ema_flag_drift_across_resume(tmp_path):
    """Resuming a pre-EMA checkpoint with ema_decay set (and the reverse)
    degrades gracefully instead of failing on the restore template."""
    import dataclasses

    from low_light_image_enhancement_tpu.train import TrainConfig, train_fcn

    base = TrainConfig(features=8, batch_size=2, crop=32, steps=1,
                       checkpoint_every=1)
    ck1 = tmp_path / "ck1"
    train_fcn(base, seed=1, checkpoint_dir=str(ck1))
    p, _ = train_fcn(
        dataclasses.replace(base, steps=2, ema_decay=0.9), seed=1,
        checkpoint_dir=str(ck1), resume=True,
    )
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(p))

    ck2 = tmp_path / "ck2"
    train_fcn(dataclasses.replace(base, ema_decay=0.9), seed=1,
              checkpoint_dir=str(ck2))
    p2, _ = train_fcn(
        dataclasses.replace(base, steps=2), seed=1,
        checkpoint_dir=str(ck2), resume=True,
    )
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(p2))


def test_guided_loss_tail_differs_and_differentiates():
    """loss_tail_taps='guided' (VERDICT r4 item 3) routes the in-loss tail
    through the guided filter: the loss must move vs the bilateral tail,
    match hand-applying ops.denoise with guided taps, and carry finite
    gradients."""
    import dataclasses

    from low_light_image_enhancement_tpu.train import (
        _denoise_tail,
        paired_curve_loss,
    )

    tcfg_b = dataclasses.replace(_TINY, denoise_in_loss=True)
    tcfg_g = dataclasses.replace(tcfg_b, loss_tail_taps="guided",
                                 loss_tail_guided_radius=4)
    low = _batch(_TINY)
    high = jnp.clip(low * 2.0, 0.0, 1.0)
    params, _ = init_train_state(_TINY)
    l_b, _ = paired_curve_loss(params, low, high, tcfg_b)
    l_g, _ = paired_curve_loss(params, low, high, tcfg_g)
    assert np.isfinite(float(l_g)) and float(l_g) != float(l_b)
    g = jax.grad(lambda p: paired_curve_loss(p, low, high, tcfg_g)[0])(
        params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    # the guided in-loss tail is exactly the pipeline's guided denoise
    from low_light_image_enhancement_tpu.config import PipelineConfig
    from low_light_image_enhancement_tpu.ops.denoise import denoise_planar
    from low_light_image_enhancement_tpu.ops.filters import shift2d

    pcfg = PipelineConfig(denoise_taps="guided", guided_radius=4)
    y = jnp.clip(low * 1.5, 0.0, 1.0)
    want = jnp.clip(
        denoise_planar(y, 1.0 / (2 * pcfg.denoise_sigma ** 2),
                       pcfg.denoise_strength, shift2d, pcfg.denoise_kernel,
                       pcfg.denoise_guide, "guided", pcfg.guided_radius,
                       pcfg.guided_eps),
        0.0, 1.0,
    )
    np.testing.assert_allclose(np.asarray(_denoise_tail(y, tcfg_g)),
                               np.asarray(want), rtol=0, atol=0)


def test_decom_relit_objective_scores_shipped_image():
    """w_relit>0 (VERDICT r4 item 3) adds an L1+SSIM term on the
    materialized relit image y = R*L**relit_gamma — the image the decom
    pipeline ships; gradients must flow and the metrics must appear."""
    import dataclasses

    from low_light_image_enhancement_tpu.models.decom import init_decom_net
    from low_light_image_enhancement_tpu.train import decom_loss

    params = init_decom_net(jax.random.PRNGKey(0))
    low = _batch(_TINY)
    high = jnp.clip(low * 2.5, 0.0, 1.0)
    tcfg0 = _TINY
    tcfg_r = dataclasses.replace(
        _TINY, w_relit=1.0, denoise_in_loss=True, loss_tail_taps="guided",
    )
    l0, m0 = decom_loss(params, low, high, tcfg0)
    lr, mr = decom_loss(params, low, high, tcfg_r)
    assert "relit_ssim" in mr and "relit_l1" in mr
    assert "relit_ssim" not in m0
    assert float(lr) > float(l0)  # the added term is nonnegative
    g = jax.grad(lambda p: decom_loss(p, low, high, tcfg_r)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
