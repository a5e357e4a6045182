"""upsample_int (the curve-map upsample of record) vs jax.image.resize:
same bilinear half-pixel grid, within float round-off."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from low_light_image_enhancement_tpu.ops.filters import shift2d, upsample_int


@pytest.mark.parametrize("ds", [2, 4, 8])
@pytest.mark.parametrize("axis", [-2, -1])
def test_matches_jax_image_resize(ds, axis):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 24, 16), np.float32))
    shape = list(x.shape)
    shape[axis] *= ds
    want = jax.image.resize(x, shape, method="bilinear")
    got = upsample_int(x, ds, axis, shift2d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-7)


def test_identity_and_odd_factor():
    x = jnp.ones((4, 4))
    assert upsample_int(x, 1, -1, shift2d) is x
    with pytest.raises(ValueError, match="even"):
        upsample_int(x, 3, -1, shift2d)


def test_translation_equivariance_mod_ds():
    """The property the sharded/striped paths rely on: shifting the input by
    one low-res row shifts the output by ds rows (interior)."""
    rng = np.random.default_rng(1)
    ds = 4
    x = jnp.asarray(rng.random((16, 8), np.float32))
    a = np.asarray(upsample_int(x, ds, -2, shift2d))
    b = np.asarray(upsample_int(jnp.roll(x, -1, axis=-2), ds, -2, shift2d))
    np.testing.assert_array_equal(a[ds + 2 : -ds - 2], b[2 : -2 * ds - 2])
