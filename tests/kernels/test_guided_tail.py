"""Guided-filter denoise tail (VERDICT r3 item 3): the margin/halo redesign
admits receptive radius >= 6, and `denoise_taps="guided"` runs the He-et-al
box-mean cascade inside the fused kernels with jnp parity — single device,
striped, and sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from low_light_image_enhancement_tpu.config import (
    MARGIN,
    PipelineConfig,
    canvas_margin,
    denoise_radius,
)
from low_light_image_enhancement_tpu.core import enhance_core_padded
from low_light_image_enhancement_tpu.data.synth import synth_batch
from low_light_image_enhancement_tpu.kernels.fused_enhance import (
    fused_retinex,
    retinex_plan_bytes_per_px,
)
from low_light_image_enhancement_tpu.kernels.striping import plan_stripes
from low_light_image_enhancement_tpu.ops.filters import roll2d
from low_light_image_enhancement_tpu.ops.guided import (
    box_mean_shift,
    guided_denoise,
    guided_joint_core_shift,
)
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline, pad_planar


# --------------------------------------------------------------------- #
# margin geometry
# --------------------------------------------------------------------- #

def test_canvas_margin_default_configs_unchanged():
    """Every pre-guided config must resolve to exactly MARGIN=4 — the
    round-4 parameterization may not move any existing geometry."""
    for cfg in (
        PipelineConfig(),
        PipelineConfig(method="curve", curve_downsample=4),
        PipelineConfig(method="hybrid"),
        PipelineConfig(method="fcn"),
        PipelineConfig(method="decom", denoise_taps="full"),
        PipelineConfig(denoise_strength=0.0),
    ):
        assert canvas_margin(cfg) == MARGIN


def test_canvas_margin_guided():
    assert denoise_radius(PipelineConfig(denoise_taps="guided")) == 4
    # retinex: blur 2 + guided 4 = 6 -> rounded to 8
    assert canvas_margin(PipelineConfig(denoise_taps="guided")) == 8
    # curve: no blur in the tail -> 4 fits the floor
    assert canvas_margin(
        PipelineConfig(method="curve", denoise_taps="guided")) == MARGIN
    # radius 4 -> receptive 8 (+blur 2) -> 16
    assert canvas_margin(
        PipelineConfig(denoise_taps="guided", guided_radius=4)) == 16
    # larger blur radii are now admissible too (the old hard MARGIN check)
    assert canvas_margin(PipelineConfig(blur_radius=5)) == 8


def test_guided_config_validation():
    with pytest.raises(ValueError, match="guided_radius"):
        PipelineConfig(denoise_taps="guided", guided_radius=0)
    with pytest.raises(ValueError, match="guided_eps"):
        PipelineConfig(denoise_taps="guided", guided_eps=0.0)
    with pytest.raises(ValueError, match="denoise_taps"):
        PipelineConfig(denoise_taps="box")


def test_learned_halo_covers_guided_radius():
    from low_light_image_enhancement_tpu.blocks import learned_halo

    # decom: 5-layer stack radius 5; bilateral tail -> 6 -> 8. guided
    # raises both the receptive radius (5 + 4 = 9) and the video-band
    # floor (margin 8 + radius 4 = 12) -> 16.
    assert learned_halo(PipelineConfig(method="decom")) == 8
    assert learned_halo(
        PipelineConfig(method="decom", denoise_taps="guided")) == 16
    # retinex+guided: the floor (8 + 4) drives the halo to 16, giving the
    # fused EMA carry band denoise_radius rows of slack per side
    assert learned_halo(PipelineConfig(denoise_taps="guided")) == 16
    # fcn: the dilation stack's radius dominates either way
    assert learned_halo(PipelineConfig(method="fcn")) == 72
    assert learned_halo(
        PipelineConfig(method="fcn", denoise_taps="guided")) == 72


# --------------------------------------------------------------------- #
# op-level: the shift cores agree with the integral-image public op
# --------------------------------------------------------------------- #

def test_box_mean_shift_matches_naive_wrap():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((24, 40), dtype=np.float32))
    r = 3
    got = np.asarray(box_mean_shift(x, r, roll2d))
    acc = np.zeros((24, 40), np.float64)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            acc += np.roll(np.asarray(x, np.float64), (dy, dx), (0, 1))
    np.testing.assert_allclose(got, acc / (2 * r + 1) ** 2, atol=1e-5)


def test_guided_shift_core_matches_public_op_interior():
    """On a replicate-padded canvas the wrap-shift guided core must equal
    the integral-image `guided_filter`-based op on every interior pixel
    (edge windows differ by construction: true means vs replicate pads)."""
    rng = np.random.default_rng(1)
    r = 2
    x = rng.random((3, 40, 56)).astype(np.float32)
    # luma of record differs between the op (BT.601) and the pipeline tail
    # (channel mean); compare the per-plane SELF-guided form instead, which
    # has no guide choice: op-level guided_filter(p, p) vs the shift core.
    from low_light_image_enhancement_tpu.ops.guided import (
        guided_core_shift,
        guided_filter,
    )

    pad = 3 * r  # wrap corruption + stats support clearance
    xp = jnp.asarray(np.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="edge"))
    got = np.asarray(guided_core_shift(xp[0], 1e-2, 1.0, roll2d, r))
    want = np.asarray(guided_filter(jnp.asarray(x[0]), jnp.asarray(x[0]),
                                    r, 1e-2))
    # interior = image pixels whose full 2r receptive window sees no edge
    # (there the padded-canvas windows and the true-mean windows coincide)
    inner = slice(2 * r, -(2 * r))
    np.testing.assert_allclose(
        got[pad:-pad, pad:-pad][inner, inner], want[inner, inner], atol=2e-5
    )


def test_guided_joint_core_denoises_and_preserves_edges():
    rng = np.random.default_rng(2)
    clean = np.zeros((48, 64), np.float32)
    clean[:, 32:] = 0.8  # one strong vertical edge
    noisy = np.clip(clean + rng.normal(0, 0.05, clean.shape), 0, 1)
    planes = [jnp.asarray(noisy)] * 3
    out = np.asarray(
        guided_joint_core_shift(planes, 3e-3, 1.0, roll2d, 2)[0])
    # noise drops on the flat halves...
    assert out[8:-8, 4:24].std() < 0.4 * noisy[8:-8, 4:24].std()
    # ...while the edge contrast survives
    assert (out[8:-8, 40:].mean() - out[8:-8, :24].mean()) > 0.6


# --------------------------------------------------------------------- #
# kernel parity (interpret mode), margin-8 canvas
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("guide", ["luma", "perchannel"])
@pytest.mark.parametrize("h,w", [(40, 72), (33, 47)])
def test_fused_retinex_guided_parity_interpret(h, w, guide):
    cfg = PipelineConfig(denoise_taps="guided", denoise_guide=guide)
    m = canvas_margin(cfg)
    assert m == 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 3, h, w), dtype=np.float32))
    plan = plan_stripes(h, w, m, cfg.stripe_rows,
                        bytes_per_px=retinex_plan_bytes_per_px(cfg))
    xp = pad_planar(x, plan, h, w)
    got = np.asarray(fused_retinex(xp, cfg, plan, interpret=True))
    want = np.asarray(enhance_core_padded(xp, cfg))
    want = want[..., m : m + plan.n_stripes * plan.stripe_rows, :]
    np.testing.assert_allclose(
        got[..., :h, m : m + w], want[..., :h, m : m + w], atol=1e-5
    )


@pytest.mark.parametrize("radius", [2, 4])
def test_fused_retinex_guided_two_radii_striped(radius):
    """Parity at 2 radii on a tall canvas that forces >= 2 stripes, so the
    stripe-halo geometry at the widened margin is exercised."""
    cfg = PipelineConfig(denoise_taps="guided", guided_radius=radius,
                         stripe_rows=32)
    m = canvas_margin(cfg)
    h, w = 96, 40
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 3, h, w), dtype=np.float32))
    plan = plan_stripes(h, w, m, cfg.stripe_rows,
                        bytes_per_px=retinex_plan_bytes_per_px(cfg))
    assert plan.n_stripes >= 2
    xp = pad_planar(x, plan, h, w)
    got = np.asarray(fused_retinex(xp, cfg, plan, interpret=True))
    want = np.asarray(enhance_core_padded(xp, cfg))
    want = want[..., m : m + plan.n_stripes * plan.stripe_rows, :]
    np.testing.assert_allclose(
        got[..., :h, m : m + w], want[..., :h, m : m + w], atol=1e-5
    )


# --------------------------------------------------------------------- #
# end-to-end + sharded
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("method", ["retinex", "curve", "hybrid"])
def test_pipeline_guided_pallas_matches_jnp(method):
    lows, _ = synth_batch(2, 40, 72)
    kw = {"curve_downsample": 2} if method in ("curve", "hybrid") else {}
    cfg = PipelineConfig(method=method, denoise_taps="guided",
                         compute_dtype="float32", **kw)
    jnp_pipe = EnhancePipeline(cfg, force_jnp=True)
    pal_pipe = EnhancePipeline(cfg, pallas_interpret=True,
                               model_params=jnp_pipe.model_params)
    assert pal_pipe._use_pallas
    a = jnp_pipe.enhance_batch(lows)
    b = pal_pipe.enhance_batch(lows)
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_sharded_guided_retinex_matches_single_device_8_shards():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (fake-device CPU env)")
    from low_light_image_enhancement_tpu.parallel import (
        enhance_spatial_sharded,
        make_mesh,
    )
    from low_light_image_enhancement_tpu.ops.colorspace import normalize_u8

    cfg = PipelineConfig(denoise_taps="guided")
    mesh = make_mesh(n_data=1, n_spatial=8)
    lows, _ = synth_batch(1, 128, 64)
    x = normalize_u8(jnp.asarray(np.transpose(lows, (0, 3, 1, 2))))
    sharded = np.asarray(enhance_spatial_sharded(x, cfg, mesh))
    single = np.asarray(EnhancePipeline(cfg, force_jnp=True)
                        .enhance_batch(lows))
    from low_light_image_enhancement_tpu.ops.colorspace import quantize_u8

    sharded_u8 = np.transpose(np.asarray(quantize_u8(jnp.asarray(sharded))),
                              (0, 2, 3, 1))
    d = np.abs(sharded_u8.astype(int) - single.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_video_guided_pallas_matches_jnp():
    """The fused EMA video kernel with the guided tail (margin-8 band
    arithmetic) against the jnp video path."""
    from low_light_image_enhancement_tpu.video import VideoEnhancer

    rng = np.random.default_rng(5)
    frames = [(rng.random((48, 64, 3)) * 255).astype(np.uint8)
              for _ in range(3)]
    cfg = PipelineConfig(denoise_taps="guided", compute_dtype="float32")
    vk = VideoEnhancer(cfg, alpha=0.3, pallas_interpret=True)
    vj = VideoEnhancer(cfg, alpha=0.3, force_jnp=True)
    for f in frames:
        d = np.abs(vk.process(f).astype(int) - vj.process(f).astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 1e-3
