import numpy as np
import jax.numpy as jnp

from low_light_image_enhancement_tpu.ops.filters import (
    gaussian_blur,
    gaussian_kernel_1d,
    roll2d,
    shift2d,
)


def test_gaussian_kernel_normalized_symmetric():
    taps = gaussian_kernel_1d(2, 1.0)
    assert len(taps) == 5
    assert abs(sum(taps) - 1.0) < 1e-12
    assert taps[0] == taps[4] and taps[1] == taps[3]
    assert taps[2] == max(taps)


def test_shift2d_matches_numpy_edge_pad():
    rng = np.random.default_rng(0)
    x = rng.random((9, 13), dtype=np.float32)
    for dy, dx in [(1, 0), (-1, 0), (0, 2), (0, -2), (2, -1), (-2, 2)]:
        got = np.asarray(shift2d(jnp.asarray(x), dy, dx))
        pad = np.pad(x, 3, mode="edge")
        want = pad[3 - dy : 3 - dy + 9, 3 - dx : 3 - dx + 13]
        np.testing.assert_allclose(got, want, atol=0)


def test_roll2d_matches_numpy_roll():
    rng = np.random.default_rng(1)
    x = rng.random((8, 12), dtype=np.float32)
    got = np.asarray(roll2d(jnp.asarray(x), 2, -3))
    want = np.roll(np.roll(x, 2, axis=0), -3, axis=1)
    np.testing.assert_array_equal(got, want)


def _np_gaussian_blur_clamp(x, radius, sigma):
    taps = np.array(gaussian_kernel_1d(radius, sigma))
    pad = np.pad(x, radius, mode="edge")
    h, w = x.shape
    tmp = np.zeros_like(pad)
    for i, t in enumerate(taps):
        tmp += t * np.roll(pad, i - radius, axis=0)
    out = np.zeros_like(pad)
    for j, t in enumerate(taps):
        out += t * np.roll(tmp, j - radius, axis=1)
    return out[radius : radius + h, radius : radius + w]


def test_gaussian_blur_clamp_vs_numpy_oracle():
    rng = np.random.default_rng(2)
    x = rng.random((16, 20), dtype=np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(x), 2, 1.0, mode="clamp"))
    want = _np_gaussian_blur_clamp(x.astype(np.float64), 2, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_blur_preserves_constant():
    x = jnp.full((12, 16), 0.37, jnp.float32)
    out = np.asarray(gaussian_blur(x, 2, 1.0))
    np.testing.assert_allclose(out, 0.37, atol=1e-6)


def test_wrap_blur_on_padded_equals_clamp_blur_interior():
    rng = np.random.default_rng(3)
    x = rng.random((16, 20), dtype=np.float32)
    m = 4
    xp = jnp.asarray(np.pad(x, m, mode="edge"))
    wrapped = np.asarray(gaussian_blur(xp, 2, 1.0, mode="wrap"))
    clamped = np.asarray(gaussian_blur(jnp.asarray(x), 2, 1.0, mode="clamp"))
    np.testing.assert_allclose(
        wrapped[m : m + 16, m : m + 20], clamped, atol=1e-6
    )
