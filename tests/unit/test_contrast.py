import numpy as np
import jax
import jax.numpy as jnp

from low_light_image_enhancement_tpu.ops.contrast import (
    autocontrast,
    clahe,
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


def test_clahe_tiles1_matches_global_equalization_at_high_clip():
    """tiles=1 with an effectively-unbounded clip limit degenerates to
    plain histogram equalization."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((24, 32)) * 0.5, jnp.float32)
    got = clahe(x, tiles=1, clip_limit=1e9)
    want = equalize_hist(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_clahe_improves_local_contrast_and_stays_bounded():
    """A dark low-contrast region gains more contrast under CLAHE than
    under the global equalization that is dominated by the bright half."""
    rng = np.random.default_rng(1)
    dark = 0.1 + 0.02 * rng.random((32, 16))
    bright = 0.7 + 0.25 * rng.random((32, 16))
    x = jnp.asarray(np.concatenate([dark, bright], axis=1), jnp.float32)
    out = np.asarray(clahe(x, tiles=4, clip_limit=4.0))
    assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6
    assert out[:, :16].std() > np.asarray(dark).std() * 2


def test_clahe_clip_limit_caps_amplification():
    """Low clip limit flattens the mapping toward identity-ish: a nearly
    uniform plane must NOT be stretched to full range (the artifact
    plain adaptive equalization produces)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(0.5 + 0.01 * rng.random((32, 32)), jnp.float32)
    hard = np.asarray(clahe(x, tiles=4, clip_limit=1e9))
    soft = np.asarray(clahe(x, tiles=4, clip_limit=1.5))
    assert hard.std() > 5 * soft.std(), (hard.std(), soft.std())


def test_clahe_batched_planar_and_odd_sizes_and_jit():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 3, 37, 45)), jnp.float32)
    out = jax.jit(lambda v: clahe(v, tiles=3))(x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_clahe_border_tiles_use_true_counts_and_tiny_images_are_finite():
    """Padded replicas carry zero histogram weight. Construction that
    catches replica domination: h=65 with tiles=8 pads SEVEN replica rows
    of the (all-bright) last row into the bottom tile row; an unmasked
    histogram would weigh brightness 8x and push the dark row-63 pixels'
    CDF toward 0 (a dark band), while true partial-tile counts keep them
    near the tile's median. Unclipped (huge limit) so the histogram — not
    the contrast limit — decides the mapping."""
    rng = np.random.default_rng(4)
    x = np.full((65, 64), 0.9, np.float32)
    x[63] = 0.1 + 0.01 * rng.random(64)  # one dark row next to the edge
    out = np.asarray(clahe(jnp.asarray(x), tiles=8, clip_limit=1e9))
    assert np.isfinite(out).all()
    # masked counts: bottom tile = 1 dark row + 1 bright row -> dark CDF
    # ranks up to 0.5, blended with the all-bright neighbor tile (LUT 0
    # for darks) gives ~0.20 measured; an 8x-replica-bright histogram
    # ranks darks <= 0.11 and lands ~0.03 after the same blend
    assert out[63].mean() > 0.12, out[63].mean()

    tiny = jnp.asarray(rng.random((10, 10)), jnp.float32)  # th=2, hp=16:
    out_t = np.asarray(clahe(tiny, tiles=8, clip_limit=2.0))  # empty tiles
    assert np.isfinite(out_t).all()
    assert 0.0 <= out_t.min() and out_t.max() <= 1.0 + 1e-6


def test_clahe_small_tiles_keep_adaptivity():
    """The clip-limit floor (1 count): small tiles must still equalize —
    without the floor every occupied bin clips and the mapping collapses
    to the identity ramp."""
    rng = np.random.default_rng(5)
    # 32x32 at tiles=8 -> 16 px/tile << 256 bins
    x = jnp.asarray(0.4 + 0.05 * rng.random((32, 32)), jnp.float32)
    out = np.asarray(clahe(x, tiles=8, clip_limit=1e9))
    # unclipped equalization must stretch a low-contrast patch well
    # beyond its input range; the identity-ramp collapse would keep
    # outputs pinned near the inputs (std ~0.014)
    assert out.std() > 0.15, out.std()
