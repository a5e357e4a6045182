import numpy as np
import jax.numpy as jnp

from low_light_image_enhancement_tpu.eval.metrics import psnr, psnr_u8, ssim, ssim_u8


def test_psnr_known_mse():
    a = jnp.zeros((3, 8, 8), jnp.float32)
    b = jnp.full((3, 8, 8), 0.1, jnp.float32)
    got = float(psnr(a, b))
    assert abs(got - 20.0) < 1e-3  # 10*log10(1/0.01), f32 rounding


def test_psnr_batched_shape():
    a = jnp.zeros((4, 3, 8, 8), jnp.float32)
    b = jnp.ones((4, 3, 8, 8), jnp.float32) * 0.5
    assert psnr(a, b).shape == (4,)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 32, 32), dtype=np.float32))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-5


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    x = rng.random((3, 32, 32)).astype(np.float32)
    small = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    s_small = float(ssim(jnp.asarray(x), jnp.asarray(small)))
    s_big = float(ssim(jnp.asarray(x), jnp.asarray(big)))
    assert 1.0 > s_small > s_big


def test_u8_helpers():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    assert psnr_u8(jnp.asarray(a), jnp.asarray(a)).shape == (2,)
    s = np.asarray(ssim_u8(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_rgb_to_lab_reference_colors():
    """White -> L*=100, a*=b*=0; black -> 0; pure sRGB red matches the
    standard D65 Lab value (53.24, 80.09, 67.20)."""
    import jax.numpy as jnp

    from low_light_image_enhancement_tpu.eval.metrics import rgb_to_lab

    def lab_of(rgb):
        img = jnp.asarray(rgb, jnp.float32).reshape(3, 1, 1)
        return np.asarray(rgb_to_lab(img)).reshape(3)

    np.testing.assert_allclose(lab_of([1, 1, 1]), [100, 0, 0], atol=0.05)
    np.testing.assert_allclose(lab_of([0, 0, 0]), [0, 0, 0], atol=0.05)
    np.testing.assert_allclose(lab_of([1, 0, 0]), [53.24, 80.09, 67.20],
                               atol=0.15)


def test_delta_e76_properties():
    import jax.numpy as jnp

    from low_light_image_enhancement_tpu.eval.metrics import (
        delta_e76,
        delta_e76_u8,
    )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((2, 3, 8, 8)), jnp.float32)
    # identity -> ~0; per-image values for batches
    d0 = np.asarray(delta_e76(a, a))
    assert d0.shape == (2,) and (d0 < 1e-2).all()
    # a visible shift -> several JND
    b = jnp.clip(a + 0.2, 0, 1)
    assert (np.asarray(delta_e76(a, b)) > 2.3).all()
    # u8 HWC wrapper agrees with the planar form
    au = rng.integers(0, 255, (4, 6, 3), np.uint8)
    bu = rng.integers(0, 255, (4, 6, 3), np.uint8)
    got = float(delta_e76_u8(jnp.asarray(au), jnp.asarray(bu)))
    ap = jnp.moveaxis(jnp.asarray(au, jnp.float32) / 255.0, -1, -3)
    bp = jnp.moveaxis(jnp.asarray(bu, jnp.float32) / 255.0, -1, -3)
    np.testing.assert_allclose(got, float(delta_e76(ap, bp)), rtol=1e-5)
