"""Parity for the fused multi-layer FCN cascade (VERDICT r3 item 2):
one Pallas kernel chaining the six dilated 96-lane layers through VMEM
line buffers must reproduce the per-layer reference stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from low_light_image_enhancement_tpu.kernels.fcn_cascade import (
    apply_fcn_cascade,
    fcn_cascade_mxu,
)
from low_light_image_enhancement_tpu.kernels.mxu_conv import (
    conv2d_dense9_mxu,
    pack_dense9_weights,
)
from low_light_image_enhancement_tpu.models.fcn import apply_fcn, init_fcn


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(0, scale, shape).astype(np.float32)
    )


@pytest.mark.parametrize("dils", [(2, 4), (2, 4, 8, 2)])
def test_cascade_matches_per_layer_dense9(dils):
    """The cascade vs the same stack run through the single-layer dense9
    kernel (both interpret mode, f32): the line-buffer lag/mask bookkeeping
    must be exact."""
    b, h2, w2, cin = 1, 24, 32, 24
    lanes = 4 * cin
    x = _rand((b, h2, w2, lanes), 0, 0.5)
    ws, bs, steps = [], [], []
    for i, d in enumerate(dils):
        w = _rand((3, 3, cin, cin), 10 + i, 0.2)
        bias = _rand((cin,), 20 + i, 0.1)
        ws.append(pack_dense9_weights(w, dilation=d))
        bs.append(bias)
        steps.append(max(1, d // 2))
    got = fcn_cascade_mxu(x, ws, bs, steps, interpret=True)
    want = x
    for wp, bias, s in zip(ws, bs, steps):
        want = conv2d_dense9_mxu(want, wp, bias, act="leaky", step=s,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_cascade_nondivisible_rows_and_batch():
    """h2 not a multiple of the band height, batch > 1 (the band counter
    and buffers must reset per image)."""
    b, h2, w2, cin = 2, 19, 32, 24
    x = _rand((b, h2, w2, 4 * cin), 3, 0.5)
    w = _rand((3, 3, cin, cin), 4, 0.2)
    bias = _rand((cin,), 5, 0.1)
    wp = pack_dense9_weights(w, dilation=2)
    got = fcn_cascade_mxu(x, [wp, wp], [bias, bias], [1, 1], interpret=True)
    want = conv2d_dense9_mxu(
        conv2d_dense9_mxu(x, wp, bias, act="leaky", step=1, interpret=True),
        wp, bias, act="leaky", step=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    # per-image isolation: image 0 alone must reproduce batch slot 0
    solo = fcn_cascade_mxu(x[:1], [wp, wp], [bias, bias], [1, 1],
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(solo[0]),
                               atol=2e-5, rtol=1e-5)


def test_apply_fcn_cascade_matches_reference():
    """Full model: im2col stem + cascade + 1x1 head vs apply_fcn (f32)."""
    params = init_fcn(jax.random.PRNGKey(0), features=24, depth=7)
    x = jnp.asarray(
        np.random.default_rng(7).random((1, 3, 80, 64), np.float32))
    got = apply_fcn_cascade(params, x, compute_dtype=jnp.float32,
                            interpret=True)
    want = apply_fcn(params, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_pipeline_fcn_cascade_matches_jnp():
    """conv_impl='cascade' end-to-end (interpret mode) vs the jnp
    reference pipeline — the full u8 block graph around the kernel."""
    from low_light_image_enhancement_tpu.config import PipelineConfig
    from low_light_image_enhancement_tpu.data.synth import synth_batch
    from low_light_image_enhancement_tpu.pipeline import EnhancePipeline

    lows, _ = synth_batch(2, 40, 72)
    cfg = PipelineConfig(method="fcn", conv_impl="cascade",
                         compute_dtype="float32")
    pal = EnhancePipeline(cfg, pallas_interpret=True)
    ref = EnhancePipeline(cfg.replace(conv_impl="xla"), force_jnp=True,
                          model_params=pal.model_params)
    a, b = pal.enhance_batch(lows), ref.enhance_batch(lows)
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_cascade_degrades_off_fcn_and_off_tpu():
    from low_light_image_enhancement_tpu.blocks import resolve_conv_impl
    from low_light_image_enhancement_tpu.config import PipelineConfig

    c = PipelineConfig(method="curve", conv_impl="cascade")
    assert resolve_conv_impl(c, use_pallas=True).conv_impl == "xla"
    f = PipelineConfig(method="fcn", conv_impl="cascade")
    assert resolve_conv_impl(f, use_pallas=False).conv_impl == "xla"
    assert resolve_conv_impl(f, interpret=True).conv_impl == "cascade"
