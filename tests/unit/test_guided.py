"""Guided filter (ops/guided.py): box-mean exactness, the guided filter's
defining properties (constant invariance, edge preservation vs box blur,
noise reduction), and differentiability."""

import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.ops.guided import (
    box_mean,
    guided_denoise,
    guided_filter,
)


def _naive_box_mean(x: np.ndarray, r: int) -> np.ndarray:
    h, w = x.shape
    out = np.zeros_like(x)
    for i in range(h):
        for j in range(w):
            ys = slice(max(0, i - r), min(h, i + r + 1))
            xs = slice(max(0, j - r), min(w, j + r + 1))
            out[i, j] = x[ys, xs].mean()
    return out


def test_box_mean_matches_naive_including_edges():
    rng = np.random.default_rng(0)
    x = rng.random((13, 17)).astype(np.float32)
    for r in (1, 2, 4):
        got = np.asarray(box_mean(jnp.asarray(x), r))
        np.testing.assert_allclose(got, _naive_box_mean(x, r),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"radius={r}")


def test_box_mean_batched_shapes():
    x = jnp.ones((2, 3, 10, 12))
    y = box_mean(x, 3)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)


def test_guided_filter_constant_invariance():
    x = jnp.full((8, 9), 0.37)
    q = guided_filter(x, x, radius=2, eps=1e-3)
    np.testing.assert_allclose(np.asarray(q), 0.37, atol=1e-5)


def test_guided_filter_preserves_edges_better_than_box():
    """Step edge: guided output tracks the step; a box mean of the same
    radius smears it. Compare mid-edge error."""
    step = jnp.concatenate(
        [jnp.zeros((16, 12)), jnp.ones((16, 12))], axis=1
    )
    rng = np.random.default_rng(1)
    noisy = step + jnp.asarray(rng.normal(0, 0.05, step.shape),
                               jnp.float32)
    q = guided_filter(noisy, noisy, radius=4, eps=1e-3)
    b = box_mean(noisy, 4)
    edge_cols = slice(10, 14)
    err_q = float(jnp.abs(q[:, edge_cols] - step[:, edge_cols]).mean())
    err_b = float(jnp.abs(b[:, edge_cols] - step[:, edge_cols]).mean())
    assert err_q < err_b / 2, (err_q, err_b)


def test_guided_denoise_reduces_noise_keeps_brightness():
    rng = np.random.default_rng(2)
    clean = np.full((3, 24, 32), 0.4, np.float32)
    noisy = np.clip(clean + rng.normal(0, 0.08, clean.shape), 0, 1)
    out = np.asarray(guided_denoise(jnp.asarray(noisy, jnp.float32),
                                    radius=2, eps=1e-2))
    assert out.std() < noisy.std() / 2
    assert abs(out.mean() - noisy.mean()) < 0.01
    # strength=0 is the identity
    out0 = np.asarray(guided_denoise(jnp.asarray(noisy, jnp.float32),
                                     strength=0.0))
    np.testing.assert_allclose(out0, noisy, atol=1e-6)


def test_guided_filter_differentiable():
    x = jnp.asarray(np.random.default_rng(3).random((3, 8, 8)),
                    jnp.float32)

    def loss(v):
        return jnp.mean(guided_denoise(v, radius=2) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
