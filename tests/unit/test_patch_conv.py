"""Patch-GEMM / im2col-GEMM conv reformulations vs lax.conv (ops/patch_conv).

The GEMM forms contract in a different order than XLA's conv, so parity is
f32-rounding-level (atol ~1e-5 on O(1) activations), not bit-exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from low_light_image_enhancement_tpu.models.layers import conv2d
from low_light_image_enhancement_tpu.ops.patch_conv import (
    conv2d_im2col_gemm,
    conv2d_patch_gemm,
    depth_to_space,
    pack_bias,
    pack_im2col_weights,
    pack_patch_weights,
    space_to_depth,
)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_s2d_d2s_roundtrip():
    x = _rand(jax.random.PRNGKey(0), (2, 8, 12, 5))
    xp = space_to_depth(x)
    assert xp.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(xp)), np.asarray(x))
    # phase-major layout: feature (p*C + c) holds pixel (2Y+py, 2X+px, c)
    np.testing.assert_array_equal(
        np.asarray(xp[0, 1, 2, 3 * 5 + 4]), np.asarray(x[0, 3, 5, 4])
    )


@pytest.mark.parametrize("cin,cout", [(3, 32), (24, 24), (32, 32), (4, 32)])
def test_patch_gemm_matches_conv(cin, cout):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = _rand(k1, (2, 16, 20, cin))
    w = _rand(k2, (3, 3, cin, cout)) * 0.1
    b = _rand(k3, (cout,)) * 0.1

    want = conv2d(x, w, b, jnp.float32)
    got = depth_to_space(
        conv2d_patch_gemm(
            space_to_depth(x), pack_patch_weights(w), pack_bias(b),
            jnp.float32,
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_patch_gemm_grouped_concat_input():
    """Skip-concat layers: input = concat of two packed tensors."""
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(2), 4)
    c1, c2, cout = 32, 32, 24
    a = _rand(k1, (1, 12, 16, c1))
    bt = _rand(k2, (1, 12, 16, c2))
    w = _rand(k3, (3, 3, c1 + c2, cout)) * 0.1
    bias = _rand(k4, (cout,)) * 0.1

    want = conv2d(jnp.concatenate([a, bt], -1), w, bias, jnp.float32)
    xp = jnp.concatenate([space_to_depth(a), space_to_depth(bt)], -1)
    got = depth_to_space(
        conv2d_patch_gemm(
            xp, pack_patch_weights(w, groups=(c1, c2)), pack_bias(bias),
            jnp.float32, groups=(c1, c2),
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("dilation", [1, 2, 4, 8])
def test_im2col_gemm_matches_dilated_conv(dilation):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    cin, cout = 24, 24
    x = _rand(k1, (2, 24, 28, cin))
    w = _rand(k2, (3, 3, cin, cout)) * 0.1
    b = _rand(k3, (cout,)) * 0.1

    want = conv2d(x, w, b, jnp.float32, dilation=dilation)
    got = conv2d_im2col_gemm(
        x, pack_im2col_weights(w), b, jnp.float32, dilation=dilation
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_patch_gemm_edge_zero_padding():
    """Edges must see conv SAME zeros, not roll wraparound."""
    cin, cout = 8, 8
    x = jnp.ones((1, 6, 6, cin), jnp.float32)
    w = jnp.ones((3, 3, cin, cout), jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)
    want = conv2d(x, w, b, jnp.float32)  # corners 4*cin, edges 6*cin, mid 9*cin
    got = depth_to_space(
        conv2d_patch_gemm(
            space_to_depth(x), pack_patch_weights(w), pack_bias(b),
            jnp.float32,
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
