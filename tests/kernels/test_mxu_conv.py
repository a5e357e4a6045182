"""Dense-9-tap packed GEMM conv kernel vs the XLA conv of record
(kernels/mxu_conv.py; interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from low_light_image_enhancement_tpu.kernels.mxu_conv import (
    conv2d_dense9_mxu,
    conv2d_patch_mxu,
    pack_dense9_weights,
)
from low_light_image_enhancement_tpu.ops.patch_conv import (
    pack_patch_weights,
)
from low_light_image_enhancement_tpu.models.layers import conv2d
from low_light_image_enhancement_tpu.ops.patch_conv import (
    depth_to_space,
    space_to_depth,
)


def _case(cin, cout, dil, h=20, w=24, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (2, h, w, cin), jnp.float32)
    wt = jax.random.normal(k2, (3, 3, cin, cout)) * 0.1
    b = jax.random.normal(k3, (cout,)) * 0.1
    return x, wt, b


@pytest.mark.parametrize(
    "cin,cout,dil",
    [(32, 32, 1), (24, 24, 1), (3, 32, 1), (4, 32, 1), (24, 24, 2),
     (24, 24, 4)],
)
def test_dense9_matches_conv(cin, cout, dil):
    x, wt, b = _case(cin, cout, dil)
    want = np.asarray(conv2d(x, wt, b, jnp.float32, dilation=dil))
    got = np.asarray(
        depth_to_space(
            conv2d_dense9_mxu(
                space_to_depth(x), pack_dense9_weights(wt, dilation=dil), b,
                act="none", step=max(1, dil // 2), interpret=True,
            )
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dense9_grouped_concat_input():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
    c1 = c2 = 32
    cout = 24
    a = jax.random.normal(k1, (1, 12, 16, c1))
    bt = jax.random.normal(k2, (1, 12, 16, c2))
    wt = jax.random.normal(k3, (3, 3, c1 + c2, cout)) * 0.1
    bias = jax.random.normal(k4, (cout,)) * 0.1
    want = np.asarray(
        conv2d(jnp.concatenate([a, bt], -1), wt, bias, jnp.float32)
    )
    xp = jnp.concatenate([space_to_depth(a), space_to_depth(bt)], -1)
    got = np.asarray(
        depth_to_space(
            conv2d_dense9_mxu(
                xp, pack_dense9_weights(wt, groups=(c1, c2)), bias,
                act="none", interpret=True,
            )
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dense9_activation_and_multi_stripe():
    """Tall image forces multiple row stripes; relu fused in-kernel."""
    x, wt, b = _case(8, 8, 1, h=80, w=16, seed=2)
    want = np.asarray(jax.nn.relu(conv2d(x, wt, b, jnp.float32)))
    got = np.asarray(
        depth_to_space(
            conv2d_dense9_mxu(
                space_to_depth(x), pack_dense9_weights(wt), b,
                act="relu", interpret=True,
            )
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("cin,cout", [(32, 32), (8, 8)])
def test_patch_mxu_matches_conv(cin, cout):
    x, wt, b = _case(cin, cout, 1, h=40, w=16, seed=7)
    want = np.asarray(conv2d(x, wt, b, jnp.float32))
    got = np.asarray(
        depth_to_space(
            conv2d_patch_mxu(
                space_to_depth(x), pack_patch_weights(wt), b,
                act="none", interpret=True,
            )
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_patch_mxu_grouped_concat_input():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(8), 4)
    c1 = c2 = 16
    cout = 8
    a = jax.random.normal(k1, (1, 12, 16, c1))
    bt = jax.random.normal(k2, (1, 12, 16, c2))
    wt = jax.random.normal(k3, (3, 3, c1 + c2, cout)) * 0.1
    bias = jax.random.normal(k4, (cout,)) * 0.1
    want = np.asarray(
        conv2d(jnp.concatenate([a, bt], -1), wt, bias, jnp.float32)
    )
    xp = jnp.concatenate([space_to_depth(a), space_to_depth(bt)], -1)
    got = np.asarray(
        depth_to_space(
            conv2d_patch_mxu(
                xp, pack_patch_weights(wt, groups=(c1, c2)), bias,
                groups=(c1, c2), act="relu", interpret=True,
            )
        )
    )
    np.testing.assert_allclose(got, np.maximum(want, 0.0), atol=2e-5)


@pytest.mark.parametrize("method", ["curve", "fcn", "decom"])
def test_model_pallas_applies_match_reference(method):
    """Whole model stacks through the kernel (interpret) vs the XLA apply."""
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 24, 32))
    if method == "curve":
        from low_light_image_enhancement_tpu.models.curve_cnn import (
            apply_curve_cnn,
            apply_curve_cnn_pallas,
            init_curve_cnn,
        )

        params = init_curve_cnn(key)
        want = apply_curve_cnn(params, x)
        got = apply_curve_cnn_pallas(params, x, compute_dtype=jnp.float32,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-6)
    elif method == "fcn":
        from low_light_image_enhancement_tpu.models.fcn import (
            apply_fcn,
            apply_fcn_pallas,
            init_fcn,
        )

        # 80 rows so the dilation-32 layer has real interior taps
        x = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 80, 96))
        params = init_fcn(key)
        want = apply_fcn(params, x)
        got = apply_fcn_pallas(params, x, compute_dtype=jnp.float32,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-6)
    else:
        from low_light_image_enhancement_tpu.models.decom import (
            apply_decom_net,
            apply_decom_net_pallas,
            init_decom_net,
        )

        params = init_decom_net(key)
        want_r, want_l = apply_decom_net(params, x)
        got_r, got_l = apply_decom_net_pallas(
            params, x, compute_dtype=jnp.float32, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                                   atol=5e-6)
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                                   atol=5e-6)
