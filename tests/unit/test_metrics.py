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
