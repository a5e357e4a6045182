import colorsys

import numpy as np
import jax.numpy as jnp

from low_light_image_enhancement_tpu.ops import colorspace as cs


def _rand_planar(shape=(3, 16, 24), seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random(shape, dtype=np.float32))


def test_normalize_quantize_roundtrip():
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    u8 = np.broadcast_to(u8, (3, 16, 16))
    x = cs.normalize_u8(jnp.asarray(u8))
    back = cs.quantize_u8(x)
    np.testing.assert_array_equal(np.asarray(back), u8)


def test_rgb_hsv_roundtrip():
    x = _rand_planar()
    back = cs.hsv_to_rgb(cs.rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_rgb_hsv_matches_colorsys():
    rng = np.random.default_rng(1)
    pts = rng.random((50, 3), dtype=np.float32)
    img = jnp.asarray(pts.T.reshape(3, 5, 10))
    hsv = np.asarray(cs.rgb_to_hsv(img)).reshape(3, -1).T
    for (r, g, b), (h, s, v) in zip(pts, hsv):
        eh, es, ev = colorsys.rgb_to_hsv(float(r), float(g), float(b))
        assert abs(v - ev) < 1e-5
        assert abs(s - es) < 1e-4
        dh = abs(h - eh)
        assert min(dh, 1 - dh) < 1e-4


def test_rgb_ycbcr_roundtrip():
    x = _rand_planar(seed=2)
    back = cs.ycbcr_to_rgb(cs.rgb_to_ycbcr(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_ycbcr_luma_of_gray():
    gray = jnp.full((3, 4, 4), 0.5, jnp.float32)
    ycc = np.asarray(cs.rgb_to_ycbcr(gray))
    np.testing.assert_allclose(ycc[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(ycc[1:], 0.5, atol=1e-6)  # neutral chroma


def test_rgb_hvi_roundtrip():
    x = _rand_planar(seed=3) * 0.9 + 0.05
    back = cs.hvi_to_rgb(cs.rgb_to_hvi(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_hvi_intensity_is_max_rgb():
    x = _rand_planar(seed=4)
    hvi = np.asarray(cs.rgb_to_hvi(x))
    np.testing.assert_allclose(hvi[2], np.asarray(x).max(0), atol=1e-6)


def test_hvi_chroma_collapses_in_dark():
    bright = jnp.asarray(np.tile([[1.0], [0.0], [0.0]], (1, 4, 4)).reshape(3, 4, 4)).astype(jnp.float32)
    dark = bright * 0.05
    hb = np.asarray(cs.rgb_to_hvi(bright))
    hd = np.asarray(cs.rgb_to_hvi(dark))
    assert np.abs(hd[:2]).max() < np.abs(hb[:2]).max() * 0.2
