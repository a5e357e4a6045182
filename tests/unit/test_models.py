import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.models import (
    apply_curve_cnn,
    apply_decom_net,
    init_curve_cnn,
    init_decom_net,
)


def test_curve_cnn_shapes_and_bounds():
    params = init_curve_cnn(jax.random.PRNGKey(0), features=8, n_iter=4)
    x = jnp.asarray(np.random.default_rng(0).random((2, 3, 16, 24), np.float32))
    a = apply_curve_cnn(params, x, n_iter=4)
    assert a.shape == (2, 4, 3, 16, 24)
    assert float(jnp.max(jnp.abs(a))) <= 1.0


def test_curve_cnn_unbatched():
    params = init_curve_cnn(jax.random.PRNGKey(0), features=8, n_iter=2)
    x = jnp.zeros((3, 8, 8), jnp.float32)
    a = apply_curve_cnn(params, x, n_iter=2)
    assert a.shape == (2, 3, 8, 8)


def test_curve_cnn_jittable_and_deterministic():
    params = init_curve_cnn(jax.random.PRNGKey(1), features=8, n_iter=2)
    x = jnp.asarray(np.random.default_rng(1).random((1, 3, 8, 16), np.float32))
    f = jax.jit(lambda p, x: apply_curve_cnn(p, x, n_iter=2))
    np.testing.assert_allclose(
        np.asarray(f(params, x)), np.asarray(apply_curve_cnn(params, x, 2)),
        atol=1e-6,
    )


def test_decom_net_outputs():
    params = init_decom_net(jax.random.PRNGKey(0), features=8)
    x = jnp.asarray(np.random.default_rng(2).random((2, 3, 16, 16), np.float32))
    r, l = apply_decom_net(params, x)
    assert r.shape == (2, 3, 16, 16) and l.shape == (2, 1, 16, 16)
    assert float(r.min()) >= 0 and float(r.max()) <= 1
    assert float(l.min()) >= 0 and float(l.max()) <= 1
