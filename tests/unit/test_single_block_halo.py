"""Single-block (unsharded) minimal-halo canvas vs the full receptive-field
halo: bit-identical by the first-divergence argument in
``blocks.single_block_halo``. The equivalence is structural — it must hold
for ANY weights — so these tests use adversarial positive biases (relu(b) > 0
cascades in the masked region are exactly the term that could leak if the
derivation were wrong; the trained weights happen to kill them, which would
mask a sizing bug)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from low_light_image_enhancement_tpu.blocks import (
    block_geometry,
    enhance_learned_block,
    learned_halo,
    single_block_halo,
)
from low_light_image_enhancement_tpu.config import MARGIN, PipelineConfig


def _positive_biases(params, key):
    out = {}
    for i, (k, p) in enumerate(sorted(params.items())):
        out[k] = dict(p)
        out[k]["b"] = (
            jnp.abs(jax.random.normal(jax.random.fold_in(key, i),
                                      p["b"].shape)) * 0.1
        )
    return out


def _params_for(cfg, key):
    if cfg.method in ("curve", "hybrid"):
        from low_light_image_enhancement_tpu.models.curve_cnn import (
            init_curve_cnn,
        )

        return _positive_biases(init_curve_cnn(key), key)
    if cfg.method == "fcn":
        from low_light_image_enhancement_tpu.models.fcn import init_fcn

        return _positive_biases(init_fcn(key), key)
    from low_light_image_enhancement_tpu.models.decom import init_decom_net

    return _positive_biases(init_decom_net(key), key)


def _run(cfg, img, halo):
    h, w = img.shape[1:3]
    h_core, wp = block_geometry(cfg, h, w)
    xb = jnp.pad(
        jnp.transpose(jnp.asarray(img), (0, 3, 1, 2)),
        ((0, 0), (0, 0), (halo, halo + h_core - h), (MARGIN, wp - w - MARGIN)),
        mode="edge",
    )
    yb = enhance_learned_block(
        xb, cfg, _params_for(cfg, jax.random.PRNGKey(3)),
        row0=-halo, h=h, w=w, halo=halo,
    )
    return np.asarray(yb[..., :h, MARGIN : MARGIN + w])


@pytest.mark.parametrize(
    "method,ds",
    [("curve", 1), ("curve", 2), ("curve", 4), ("hybrid", 1), ("hybrid", 4),
     ("fcn", 1), ("decom", 1)],
)
def test_small_halo_bit_identical(method, ds):
    cfg = PipelineConfig(method=method, curve_downsample=ds,
                         compute_dtype="float32")
    small, big = single_block_halo(cfg), learned_halo(cfg)
    assert small <= big
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 120, 160, 3), dtype=np.uint8)
    np.testing.assert_array_equal(_run(cfg, img, small), _run(cfg, img, big))


def test_fcn_halo_is_divergence_reach_not_receptive_radius():
    """fcn's single-block halo is the layer-2..7 divergence reach (63) + 1
    bilateral row rounded to sublanes = 64, below the 72-row full
    receptive-field halo. One halo step smaller (56 < 64) must CHANGE the
    output — the leaky_relu bias cascades reach consumed rows — proving the
    64 bound is tight, not vacuous."""
    cfg = PipelineConfig(method="fcn", compute_dtype="float32")
    assert single_block_halo(cfg) == 64
    assert learned_halo(cfg) == 72
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (1, 120, 160, 3), dtype=np.uint8)
    big = _run(cfg, img, learned_halo(cfg))
    assert np.any(_run(cfg, img, 56) != big)


def test_pipeline_matches_block_reference():
    """The pipeline's minimal-canvas route equals the big-halo block run on
    the shipped (trained) weights end-to-end."""
    from low_light_image_enhancement_tpu.pipeline import EnhancePipeline

    cfg = PipelineConfig(method="curve", compute_dtype="float32")
    pipe = EnhancePipeline(cfg, force_jnp=True)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (96, 160, 3), dtype=np.uint8)
    got = np.asarray(pipe.enhance(img))
    want = _run_trained(cfg, img[None], learned_halo(cfg),
                        pipe.model_params)[0].transpose(1, 2, 0)
    # the two canvas sizes compile as different jit programs; XLA fusion
    # differences flip isolated u8 quantize ties (the sigma=0.2 default
    # landed 1 px / 46,080 on one) — same documented tolerance as the
    # sharded parity tests. The halo-size analysis itself stays bit-exact
    # within ONE jit context (test_small_halo_bit_identical), and
    # test_fcn_halo_is_divergence_reach... proves the bound is tight.
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3, (d.max(), (d > 0).mean())


def _run_trained(cfg, img, halo, params):
    h, w = img.shape[1:3]
    h_core, wp = block_geometry(cfg, h, w)
    xb = jnp.pad(
        jnp.transpose(jnp.asarray(img), (0, 3, 1, 2)),
        ((0, 0), (0, 0), (halo, halo + h_core - h), (MARGIN, wp - w - MARGIN)),
        mode="edge",
    )
    yb = enhance_learned_block(xb, cfg, params, row0=-halo, h=h, w=w,
                               halo=halo)
    return np.asarray(yb[..., :h, MARGIN : MARGIN + w])
