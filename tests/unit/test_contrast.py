import numpy as np
import jax
import jax.numpy as jnp

from low_light_image_enhancement_tpu.ops.contrast import (
    autocontrast,
    equalize_hist,
)


def test_autocontrast_stretches_range():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 32, 32), np.float32) * 0.2 + 0.1)
    y = np.asarray(autocontrast(x))
    assert y.min() < 0.02 and y.max() > 0.98
    # monotone: ordering of pixel values preserved
    xf, yf = np.asarray(x).ravel(), y.ravel()
    order = np.argsort(xf)
    assert (np.diff(yf[order]) >= -1e-6).all()


def test_autocontrast_per_channel():
    x = jnp.stack([jnp.linspace(0.4, 0.5, 64).reshape(8, 8),
                   jnp.linspace(0.0, 1.0, 64).reshape(8, 8),
                   jnp.full((8, 8), 0.5)])
    y = np.asarray(autocontrast(x, per_channel=True))
    assert y[0].max() > 0.9  # narrow channel stretched on its own


def test_equalize_hist_flattens_distribution():
    rng = np.random.default_rng(1)
    # heavily skewed dark distribution
    x = jnp.asarray((rng.random((1, 64, 64)) ** 3).astype(np.float32))
    y = np.asarray(equalize_hist(x))
    # equalized values approximate U[0,1]: mean near 0.5
    assert abs(y.mean() - 0.5) < 0.05
    assert y.shape == x.shape


def test_equalize_hist_jittable_and_batched():
    x = jnp.asarray(np.random.default_rng(2).random((2, 3, 16, 16), np.float32))
    y = jax.jit(equalize_hist)(x)
    assert y.shape == x.shape
