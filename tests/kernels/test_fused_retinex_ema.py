"""Dedicated parity + adversarial tests for ``kernels.fused_retinex_ema`` —
the default-on fully-fused retinex video step (VERDICT r3 item 1).

Two contracts pinned here:

1. **Math parity**: the kernel (interpret mode) reproduces an in-test jnp
   oracle of the documented EMA algebra — normalize -> max-RGB illumination
   -> separable blur -> per-pixel EMA with the negative-carry sentinel ->
   temporally-relit gain ``exp(gamma*log(l_mix) - log(l_now))`` -> margin
   column replication -> denoise -> quantize — on every consumed pixel, for
   fresh (sentinel), initialized, and per-pixel-mixed carries, u8 and f32 io.

2. **Consumed-band isolation** (the load-bearing exactness argument of
   ``video._fused_ema_tail`` and ``parallel.video_sharded``): carry rows
   OUTSIDE the interior band [halo - MARGIN, halo + rows + MARGIN) are never
   read — poisoning them (huge values AND the negative sentinel) must not
   change the output frame or the new carry, single-device and sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from low_light_image_enhancement_tpu.blocks import (
    learned_halo,
    replicate_margin_cols,
)
from low_light_image_enhancement_tpu.config import MARGIN, PipelineConfig
from low_light_image_enhancement_tpu.core import enhance_core_padded  # noqa: F401 (parity family)
from low_light_image_enhancement_tpu.kernels.fused_enhance import (
    fused_retinex_ema,
    retinex_plan_bytes_per_px,
)
from low_light_image_enhancement_tpu.kernels.striping import plan_stripes
from low_light_image_enhancement_tpu.ops.colorspace import (
    normalize_u8,
    quantize_u8,
)
from low_light_image_enhancement_tpu.ops.filters import roll2d, separable_blur
from low_light_image_enhancement_tpu.pipeline import pad_planar
from low_light_image_enhancement_tpu.video import VideoEnhancer, _denoise_tail


def _oracle_ema(xp, carry, cfg, alpha, img_w):
    """The documented EMA video algebra on the whole padded canvas (the jnp
    reference of record for the kernel: video.video_step's non-fused branch
    restricted to one canvas)."""
    u8_io = xp.dtype == jnp.uint8
    xf = normalize_u8(xp) if u8_io else xp
    l_now = separable_blur(jnp.max(xf, axis=-3), cfg.blur_radius,
                           cfg.blur_sigma, roll2d)
    l_mix = jnp.where(carry < 0.0, l_now,
                      alpha * l_now + (1.0 - alpha) * carry)
    gain = jnp.exp(cfg.gamma * jnp.log(jnp.clip(l_mix, cfg.illum_eps, 1.0))
                   - jnp.log(jnp.clip(l_now, cfg.illum_eps, 1.0)))
    gain = replicate_margin_cols(gain, img_w)
    y = _denoise_tail(jnp.clip(xf * gain[:, None], 0.0, 1.0), cfg)
    return (quantize_u8(y) if u8_io else y), l_mix


def _canvas(b, h, w, cfg, seed, u8):
    rng = np.random.default_rng(seed)
    x = rng.random((b, 3, h, w), dtype=np.float32)
    if u8:
        x = (x * 255).round().astype(np.uint8)
    plan = plan_stripes(h, w, MARGIN, cfg.stripe_rows,
                        bytes_per_px=retinex_plan_bytes_per_px(cfg) + 16)
    return pad_planar(jnp.asarray(x), plan, h, w), plan


@pytest.mark.parametrize("carry_mode", ["fresh", "init", "mixed"])
@pytest.mark.parametrize("u8", [True, False])
def test_fused_retinex_ema_matches_jnp_oracle(carry_mode, u8):
    cfg = PipelineConfig()
    h, w, alpha = 40, 72, 0.3
    xp, plan = _canvas(2, h, w, cfg, seed=7, u8=u8)
    rng = np.random.default_rng(8)
    carry = rng.random((2,) + xp.shape[-2:], dtype=np.float32) * 0.5 + 0.05
    if carry_mode == "fresh":
        carry = np.full_like(carry, -1.0)  # the uninitialized sentinel
    elif carry_mode == "mixed":
        # per-pixel sentinel mix: a multi-stream batch where one stream was
        # just reset sees exactly this
        carry[0][rng.random(carry[0].shape) < 0.5] = -1.0
    carry = jnp.asarray(carry)
    got, got_lmix = fused_retinex_ema(xp, carry, cfg, plan, alpha, w,
                                      interpret=True)
    want, want_lmix = _oracle_ema(xp, carry, cfg, alpha, w)
    m = plan.margin
    want = want[..., m : m + plan.n_stripes * plan.stripe_rows, :]
    want_lmix = want_lmix[..., m : m + plan.n_stripes * plan.stripe_rows, :]
    g = np.asarray(got)[..., :h, m : m + w]
    wv = np.asarray(want)[..., :h, m : m + w]
    if u8:
        d = np.abs(g.astype(int) - wv.astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 1e-3
    else:
        np.testing.assert_allclose(g, wv, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_lmix)[..., :h, m : m + w],
        np.asarray(want_lmix)[..., :h, m : m + w], atol=1e-6,
    )


def test_alpha_one_reduces_to_stateless_illumination():
    """alpha=1 ignores the carry entirely: a garbage (but positive) carry
    produces the same frame as the sentinel carry."""
    cfg = PipelineConfig()
    xp, plan = _canvas(1, 40, 72, cfg, seed=3, u8=True)
    junk = jnp.full((1,) + xp.shape[-2:], 0.77)
    fresh = jnp.full((1,) + xp.shape[-2:], -1.0)
    a, _ = fused_retinex_ema(xp, junk, cfg, plan, 1.0, 72, interpret=True)
    b, _ = fused_retinex_ema(xp, fresh, cfg, plan, 1.0, 72, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _poison(carry_np, lo, hi, value):
    """Poison carry rows outside the consumed band [lo, hi)."""
    c = carry_np.copy()
    c[..., :lo, :] = value
    c[..., hi:, :] = value
    return c


@pytest.mark.parametrize("poison_value", [1e6, -5.0])
def test_video_step_ignores_carry_outside_consumed_band(poison_value):
    """The adversarial carry-band test (VERDICT r3 item 1): on the fused
    path, carry rows outside [halo - MARGIN, halo + rows + MARGIN) must be
    dead — poisoning them (huge positive, and the negative sentinel that
    would flip those pixels to 'uninitialized' if read) changes neither the
    output frames nor the evolving carry, over multiple frames."""
    cfg = PipelineConfig(compute_dtype="float32")
    halo = learned_halo(cfg)
    rng = np.random.default_rng(11)
    frames = [(rng.random((40, 64, 3)) * 255).astype(np.uint8)
              for _ in range(3)]

    ve_a = VideoEnhancer(cfg, alpha=0.3, pallas_interpret=True)
    ve_b = VideoEnhancer(cfg, alpha=0.3, pallas_interpret=True)
    assert ve_a._use_pallas
    oa = ve_a.process(frames[0])
    ob = ve_b.process(frames[0])
    np.testing.assert_array_equal(oa, ob)

    # poison ve_b's carry rows outside the consumed band
    flag, carry = ve_b._state
    rows = np.asarray(carry).shape[-2] - 2 * halo  # block rows
    lo, hi = halo - MARGIN, halo + rows + MARGIN
    assert lo > 0, "test needs a nonempty outside-band region"
    ve_b._state = (flag,
                   jnp.asarray(_poison(np.asarray(carry), lo, hi,
                                       poison_value)))
    for f in frames[1:]:
        oa = ve_a.process(f)
        ob = ve_b.process(f)
        np.testing.assert_array_equal(oa, ob)
    # and the carries re-converge exactly: the fused step re-derives the
    # outside-band rows by edge replication every frame
    np.testing.assert_array_equal(np.asarray(ve_a._state[1]),
                                  np.asarray(ve_b._state[1]))


def test_sharded_video_ignores_carry_outside_consumed_band():
    """Same poison argument per shard: each shard's outside-band carry rows
    (its halo overlap region minus the MARGIN-consumed edge) are dead."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices (fake-device CPU env)")
    from low_light_image_enhancement_tpu.parallel import (
        SpatialShardedVideoEnhancer,
        make_mesh,
    )

    cfg = PipelineConfig(compute_dtype="float32")
    halo = learned_halo(cfg)
    mesh = make_mesh(n_data=1, n_spatial=2)
    rng = np.random.default_rng(12)
    frames = [(rng.random((96, 64, 3)) * 255).astype(np.uint8)
              for _ in range(3)]

    sa = SpatialShardedVideoEnhancer(mesh, cfg, alpha=0.3,
                                     pallas_interpret=True)
    sb = SpatialShardedVideoEnhancer(mesh, cfg, alpha=0.3,
                                     pallas_interpret=True)
    np.testing.assert_array_equal(sa.process(frames[0]),
                                  sb.process(frames[0]))
    flag, carry = sb._state  # (n_shards, canvas_rows, wp)
    rows = np.asarray(carry).shape[-2] - 2 * halo
    lo, hi = halo - MARGIN, halo + rows + MARGIN
    sb._state = (flag, jnp.asarray(_poison(np.asarray(carry), lo, hi, 1e6)))
    for f in frames[1:]:
        np.testing.assert_array_equal(sa.process(f), sb.process(f))
    np.testing.assert_array_equal(np.asarray(sa._state[1]),
                                  np.asarray(sb._state[1]))


def test_traced_alpha_raises_clear_error_on_fused_path():
    """ADVICE r3: float(alpha) inside the kernel would raise an opaque
    ConcretizationTypeError if a caller jits video_step over alpha; the
    fused path must instead name ema_in_kernel=False as the escape hatch —
    and that path must actually accept the traced alpha."""
    from low_light_image_enhancement_tpu.blocks import block_geometry
    from low_light_image_enhancement_tpu.video import video_step

    cfg = PipelineConfig(compute_dtype="float32")
    halo = learned_halo(cfg)
    h, w = 40, 64
    h_core, wp = block_geometry(cfg, h, w)
    xb = jnp.zeros((3, h_core + 2 * halo, wp), jnp.uint8)
    state = (jnp.zeros((), bool), jnp.zeros((h_core + 2 * halo, wp)))

    def step(state, xb, alpha, ema_in_kernel):
        return video_step(state, xb, cfg, alpha, None, h, w,
                          use_pallas=True, interpret=True,
                          ema_in_kernel=ema_in_kernel)

    with pytest.raises(TypeError, match="ema_in_kernel=False"):
        jax.jit(step, static_argnums=(3,))(state, xb, 0.3, True)
    # the documented escape hatch traces fine
    (_, carry2), out = jax.jit(step, static_argnums=(3,))(
        state, xb, 0.3, False)
    assert out.shape[-2] == h_core and carry2.shape == state[1].shape
