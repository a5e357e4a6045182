"""Model-level GEMM conv stacks vs the XLA-conv reference applies."""

import jax
import jax.numpy as jnp
import numpy as np

from low_light_image_enhancement_tpu.models.curve_cnn import (
    apply_curve_cnn,
    apply_curve_cnn_gemm,
    init_curve_cnn,
)
from low_light_image_enhancement_tpu.models.decom import (
    apply_decom_net,
    apply_decom_net_gemm,
    init_decom_net,
)
from low_light_image_enhancement_tpu.models.fcn import (
    apply_fcn,
    apply_fcn_gemm,
    init_fcn,
)


def _img(key, shape):
    return jax.random.uniform(key, shape, jnp.float32)


def test_curve_cnn_gemm_matches_reference():
    params = init_curve_cnn(jax.random.PRNGKey(0))
    x = _img(jax.random.PRNGKey(1), (2, 3, 24, 32))
    want = np.asarray(apply_curve_cnn(params, x))
    got = np.asarray(apply_curve_cnn_gemm(params, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-6)
    # unbatched
    got1 = np.asarray(apply_curve_cnn_gemm(params, x[0]))
    np.testing.assert_allclose(got1, want[0], atol=3e-6)


def test_fcn_gemm_matches_reference():
    params = init_fcn(jax.random.PRNGKey(2))
    # tall enough that the 32-dilation layer has interior pixels
    x = _img(jax.random.PRNGKey(3), (1, 3, 80, 96))
    want = np.asarray(apply_fcn(params, x))
    got = np.asarray(apply_fcn_gemm(params, x))
    np.testing.assert_allclose(got, want, atol=3e-6)


def test_decom_gemm_matches_reference():
    params = init_decom_net(jax.random.PRNGKey(4))
    x = _img(jax.random.PRNGKey(5), (2, 3, 16, 24))
    want_r, want_l = apply_decom_net(params, x)
    got_r, got_l = apply_decom_net_gemm(params, x)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               atol=3e-6)


def test_curve_cnn_gemm_grad_flows():
    """The GEMM path must be trainable: finite grads through the packing."""
    params = init_curve_cnn(jax.random.PRNGKey(6), features=8, n_iter=2)
    x = _img(jax.random.PRNGKey(7), (1, 3, 8, 8))

    def loss(p):
        return jnp.mean(apply_curve_cnn_gemm(p, x, n_iter=2) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    assert any(float(jnp.abs(t).max()) > 0 for t in flat)
