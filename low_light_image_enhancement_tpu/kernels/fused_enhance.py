"""Fused Retinex-enhance Pallas kernel (the config-2 hot path).

One grid step = one VMEM-resident image stripe. Inside the kernel:
u8 -> f32 normalization -> max-RGB illumination -> separable Gaussian blur ->
clip -> gamma boost (algebraic form ``x * L**(gamma-1)``) -> 3x3 bilateral
denoise -> clip -> u8 quantization. A single HBM read + write per stripe —
in u8, so the whole pipeline moves ~1.4 MB/image of HBM traffic instead of
the ~28 MB a staged f32 graph would; every intermediate lives in
VMEM/registers. Math mirrors ``core.enhance_core_padded`` +
``ops.colorspace.quantize_u8`` tap-for-tap.

Spec: BASELINE.json north_star ("all per-pixel transforms ... fuse into
Pallas kernels"), target >=1000 600x400 img/s/chip.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.kernels.striping import (
    StripePlan,
    extract_stripes,
    merge_stripes,
    stripe_pallas_call,
    stripe_pallas_call_windowed,
    use_windowed,
    windows_aligned,
)
from low_light_image_enhancement_tpu.ops.denoise import plane_cores
from low_light_image_enhancement_tpu.ops.filters import separable_blur


def kroll2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """In-kernel circular shift matching ``ops.filters.roll2d`` semantics
    (out[y, x] = in[y - dy, x - dx])."""
    if dy:
        x = pltpu.roll(x, dy % x.shape[-2], axis=x.ndim - 2)
    if dx:
        x = pltpu.roll(x, dx % x.shape[-1], axis=x.ndim - 1)
    return x


def _kreplicate_cols(y, margin, img_w):
    """In-kernel mirror of ``blocks.replicate_margin_cols`` (two lane
    selects): canvas cols [0, margin) := boosted image col 0, cols
    [margin+img_w, Wp) := boosted image col img_w-1."""
    import jax

    wb = y.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1)
    left = y[:, margin:margin + 1]
    right = y[:, margin + img_w - 1:margin + img_w]
    y = jnp.where(col < margin, left, y)
    return jnp.where(col >= margin + img_w, right, y)


def _finalize_plane(y, margin, th, u8_io):
    y = jnp.clip(y, 0.0, 1.0)[margin : margin + th, :]
    if u8_io:
        y = jnp.clip(jnp.round(y * 255.0), 0.0, 255.0)
        y = y.astype(jnp.int32).astype(jnp.uint8)
    return y


def _retinex_kernel(
    x_ref, *refs, radius, sigma, gamma, eps, inv2s2, strength, margin, th,
    u8_io, dn_kind="exp", guide="perchannel", taps="full",
    stages=("blur", "boost", "denoise"), ext_gain=False,
    ema_alpha=None, img_w=0, g_radius=2, g_eps=3e-3,
):
    """``stages`` gates the pipeline's compute stages so the per-stage
    device-time tool (scripts/profile_stages.py) can compile truncated
    variants and difference their rates; production always passes all.

    ``ext_gain``: an extra f32 gain-plane stripe input precedes the output
    ref; the kernel applies ``y = x * gain`` instead of computing the
    illumination boost — the temporally-EMA'd video path's legacy seam
    (video.video_step computes the gain from the smoothed illumination in
    XLA and the kernel keeps the u8 fast path + fused denoise).

    ``ema_alpha``: the fully-fused video step (video.video_step's default
    TPU path). An f32 EMA-carry stripe input precedes the output refs and a
    second output ref receives the mixed illumination plane. The kernel
    computes the per-frame illumination (max-RGB -> separable blur), mixes
    ``l_mix = alpha * l_now + (1 - alpha) * carry`` per pixel (a NEGATIVE
    carry value is the not-yet-initialized sentinel: that pixel takes
    ``l_now`` — so first frames and per-stream scene-cut resets need no
    scalar plumbing), applies the temporally-relit gain
    ``exp(gamma*log(l_mix) - log(l_now))`` (per-frame reflectance, EMA'd
    illumination — same algebra as the jnp path at video.video_step), and
    writes both the enhanced stripe and ``l_mix``'s interior rows. All
    arithmetic mirrors the jnp path op-for-op, so consumed pixels are
    bit-exact vs the XLA ext_gain route up to cross-compiler exp/log ulps.
    ``img_w`` restores the MARGIN column-replica invariant on the gain
    (mirror of blocks.replicate_margin_cols, as the jnp path applies)."""
    if ema_alpha is not None:
        c_ref, o_ref, l_ref = refs
        raw = x_ref[0, 0]  # (3, THh, Wp)
        if u8_io:
            x = raw.astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        else:
            x = raw
        l0 = jnp.maximum(jnp.maximum(x[0], x[1]), x[2])
        l_now = separable_blur(l0, radius, sigma, kroll2d)
        carry = c_ref[0, 0, 0]
        l_mix = jnp.where(carry < 0.0,
                          l_now,
                          ema_alpha * l_now + (1.0 - ema_alpha) * carry)
        gain = jnp.exp(gamma * jnp.log(jnp.clip(l_mix, eps, 1.0))
                       - jnp.log(jnp.clip(l_now, eps, 1.0)))
        gain = _kreplicate_cols(gain, margin, img_w)
        core1, corej = plane_cores(guide, taps, g_radius, g_eps)
        do_dn = strength > 0.0
        if do_dn and guide == "luma":
            ys = [jnp.clip(x[c] * gain, 0.0, 1.0) for c in range(3)]
            ys = corej(ys, inv2s2, strength, kroll2d, dn_kind)
            for c in range(3):
                o_ref[0, 0, c] = _finalize_plane(ys[c], margin, th, u8_io)
        else:
            for c in range(3):
                y = jnp.clip(x[c] * gain, 0.0, 1.0)
                if do_dn:
                    y = core1(y, inv2s2, strength, kroll2d, dn_kind)
                o_ref[0, 0, c] = _finalize_plane(y, margin, th, u8_io)
        l_ref[0, 0, 0] = l_mix[margin : margin + th, :]
        return
    if ext_gain:
        g_ref, o_ref = refs
    else:
        (o_ref,) = refs
    raw = x_ref[0, 0]  # (3, THh, Wp)
    if u8_io:
        # Mosaic has no direct u8<->f32 cast; bridge through int32.
        x = raw.astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    else:
        x = raw
    boost = None
    if ext_gain:
        boost = g_ref[0, 0, 0]  # (THh, Wp) f32
    elif "boost" in stages or "blur" in stages:
        l0 = jnp.maximum(jnp.maximum(x[0], x[1]), x[2])
        l = jnp.clip(separable_blur(l0, radius, sigma, kroll2d), eps, 1.0) \
            if "blur" in stages else jnp.clip(l0, eps, 1.0)
        if "boost" in stages:
            boost = jnp.exp((gamma - 1.0) * jnp.log(l))
        else:
            boost = l  # keep the blur's result live without the exp/log
    do_dn = strength > 0.0 and "denoise" in stages
    core1, corej = plane_cores(guide, taps, g_radius, g_eps)
    if do_dn and guide == "luma":
        # joint bilateral: one weight plane per tap shared by all channels
        ys = [x[c] if boost is None else jnp.clip(x[c] * boost, 0.0, 1.0)
              for c in range(3)]
        ys = corej(ys, inv2s2, strength, kroll2d, dn_kind)
        for c in range(3):
            o_ref[0, 0, c] = _finalize_plane(ys[c], margin, th, u8_io)
        return
    for c in range(3):  # per-plane 2-D ops keep Mosaic layouts simple
        y = x[c] if boost is None else jnp.clip(x[c] * boost, 0.0, 1.0)
        if do_dn:
            y = core1(y, inv2s2, strength, kroll2d, dn_kind)
        o_ref[0, 0, c] = _finalize_plane(y, margin, th, u8_io)


def _curve_kernel(
    x_ref, m_ref, *refs, boost, n_iter, radius, sigma, gamma, eps, inv2s2,
    strength, margin, th, u8_io, ds, dn_kind="exp", guide="perchannel",
    taps="full", img_w=0, ext_gain=False, g_radius=2, g_eps=3e-3,
):
    """Fused learned tail (BASELINE.json north_star conv-net fusion, tail
    half): u8 normalize -> optional retinex boost (hybrid) -> ``n_iter``
    LE-curve iterations from the CNN's parameter maps -> bilateral denoise ->
    u8 quantize. Math mirrors ``blocks.enhance_learned_block`` tap-for-tap;
    the curve maps arrive as a second stripe input (the only f32 HBM traffic
    left on the curve path). With ``ds`` in {2, 4} the maps come in fully
    low-res (1/ds rows AND cols) and are upsampled here with the upsample of
    record (``ops.filters.upsample_int`` + roll shifts), cols first at 1/ds
    rows, then rows — ds^2 x less map traffic, and the XLA column-upsample
    pass (measured 178 us/img at 600x400 ds=4) disappears entirely. The
    phase-blend planes are hoisted out of the per-channel loop (they only
    depend on the index mod ds). Roll-wrap vs the reference's clamp shifts
    differs only within ds/2 <= margin rows/cols of the stripe edge, which
    the crop discards — bit-exact on consumed pixels."""
    from low_light_image_enhancement_tpu.ops.filters import upsample_phase

    if ext_gain:
        g_ref, o_ref = refs
    else:
        (o_ref,) = refs
    raw = x_ref[0, 0]   # (3, THh, Wp)
    maps = m_ref[0, 0]  # (n_iter*3, THh/ds, Wp/ds) f32
    if u8_io:
        x = raw.astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    else:
        x = raw
    if ds > 1:
        lo_rows = maps.shape[-2]
        # Column-upsample phase plane, in TRANSPOSED orientation: Mosaic has
        # no lane-interleave (jnp.repeat on the lane axis fails to lower), so
        # columns are upsampled as sublanes between two exact swapaxes.
        f_up_c = upsample_phase((raw.shape[-1], lo_rows), ds, 0, jnp.float32)
        f_com_c = 1.0 - f_up_c
        f_up = upsample_phase(raw.shape[-2:], ds, 0, jnp.float32)
        f_com = 1.0 - f_up
        half = ds // 2
    if ext_gain:
        # Temporally-EMA'd gain plane from video.video_step; already carries
        # the MARGIN column-replica invariant, so _kreplicate_cols is skipped.
        gain = g_ref[0, 0, 0]
        boost = True
        img_w = 0
    elif boost:
        l0 = jnp.maximum(jnp.maximum(x[0], x[1]), x[2])
        l = jnp.clip(separable_blur(l0, radius, sigma, kroll2d), eps, 1.0)
        gain = jnp.exp((gamma - 1.0) * jnp.log(l))
    joint = strength > 0.0 and guide == "luma"
    core1, corej = plane_cores(guide, taps, g_radius, g_eps)
    ys = []
    for c in range(3):  # per-plane 2-D ops keep Mosaic layouts simple
        y = x[c]
        if boost:
            y = jnp.clip(y * gain, 0.0, 1.0)
            if img_w:  # restore the MARGIN column-replica invariant the
                y = _kreplicate_cols(y, margin, img_w)  # wrap blur broke
        for i in range(n_iter):  # static unroll, as ops.curves.apply_curves
            a = maps[i * 3 + c]
            if ds > 1:
                # same float ops and order as blocks._curve_maps: cols
                # (at 1/ds rows) then rows, each lo*(1-f) + hi*f. The col
                # pass runs transposed (cols as sublanes) since Mosaic
                # supports sublane interleave + swapaxes but not lane
                # interleave; swapaxes is exact, so parity is untouched.
                rep = jnp.repeat(jnp.swapaxes(a, 0, 1), ds, axis=0)
                at = kroll2d(rep, half, 0) * f_com_c \
                    + kroll2d(rep, -half, 0) * f_up_c
                rep = jnp.repeat(jnp.swapaxes(at, 0, 1), ds, axis=0)
                a = kroll2d(rep, half, 0) * f_com \
                    + kroll2d(rep, -half, 0) * f_up
            y = y + a * y * (1.0 - y)
        y = jnp.clip(y, 0.0, 1.0)
        if joint:
            ys.append(y)  # joint denoise needs all channels below
            continue
        if strength > 0.0:
            y = core1(y, inv2s2, strength, kroll2d, dn_kind)
        o_ref[0, 0, c] = _finalize_plane(y, margin, th, u8_io)
    if joint:
        ys = corej(ys, inv2s2, strength, kroll2d, dn_kind)
        for c in range(3):
            o_ref[0, 0, c] = _finalize_plane(ys[c], margin, th, u8_io)


def fused_curve_enhance(
    xp: jnp.ndarray,
    curve_maps: jnp.ndarray,
    cfg: PipelineConfig,
    plan: StripePlan,
    interpret: bool = False,
    ds: int = 1,
    img_w: int = 0,
    gain: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused curve/hybrid tail over a padded planar batch.

    Args:
      xp: (B, 3, Hp, Wp) padded canvas, uint8 (fast path) or f32 in [0, 1].
      curve_maps: f32 LE-curve maps on the same canvas (from
        ``models.apply_curve_cnn`` / ``blocks._curve_maps``): ``ds`` == 1 —
        (B, n_iter, 3, Hp, Wp) full-res; ``ds`` in {2, 4} — (B, n_iter, 3,
        Hp/ds, Wp/ds) fully low-res, both axes upsampled in-kernel. Hp, Wp,
        the stripe rows and the margin must all divide by ds (the pipeline's
        8-multiples and the 128-lane width rounding guarantee it).
      plan: stripe plan for (Hp, Wp) — use ``bytes_per_px`` sized for the
        map planes (see ``curve_plan_bytes_per_px``).

    Returns (B, 3, S*TH, Wp): rows [margin, margin + S*TH) of the canvas;
    caller crops columns. Output dtype matches ``xp``.
    """
    u8_io = xp.dtype == jnp.uint8
    b, n_iter = curve_maps.shape[0], curve_maps.shape[1]
    maps_flat = curve_maps.reshape(b, n_iter * 3, *curve_maps.shape[-2:])

    if ds != 1 and (plan.stripe_rows % ds or plan.margin % ds):
        raise ValueError(
            f"stripe rows {plan.stripe_rows} / margin {plan.margin} "
            f"not divisible by curve_downsample={ds}"
        )
    # the 1/ds low-res maps input must also satisfy Mosaic's (8, 128)
    # block divisibility for element-offset windows (windows_aligned);
    # ds in {2, 4} usually fails it -> stripes form (the extract copy
    # being saved there is ds^2 smaller than the image's anyway)
    windowed = (use_windowed(cfg.stripe_windowed, plan)
                and windows_aligned(plan, ds))
    if windowed:
        inputs = [xp, maps_flat]
        if gain is not None:
            inputs.append(gain[:, None].astype(jnp.float32))
    else:
        x_stripes = jnp.transpose(extract_stripes(xp, plan),
                                  (0, 2, 1, 3, 4))
        lo_plan = plan if ds == 1 else StripePlan(
            plan.n_stripes, plan.stripe_rows // ds, plan.padded_h // ds,
            plan.padded_w // ds, plan.margin // ds,
        )
        m_stripes = jnp.transpose(extract_stripes(maps_flat, lo_plan),
                                  (0, 2, 1, 3, 4))
        inputs = [x_stripes, m_stripes]
        if gain is not None:
            # (B, Hp, Wp) externally-computed boost plane (video EMA path)
            inputs.append(
                jnp.transpose(
                    extract_stripes(gain[:, None].astype(jnp.float32), plan),
                    (0, 2, 1, 3, 4),
                )
            )
    kernel = functools.partial(
        _curve_kernel,
        boost=cfg.method == "hybrid",
        n_iter=n_iter,
        radius=cfg.blur_radius,
        sigma=cfg.blur_sigma,
        gamma=cfg.gamma,
        eps=cfg.illum_eps,
        inv2s2=1.0 / (2.0 * cfg.denoise_sigma * cfg.denoise_sigma),
        strength=cfg.denoise_strength,
        margin=plan.margin,
        th=plan.stripe_rows,
        u8_io=u8_io,
        ds=ds,
        dn_kind=cfg.denoise_kernel,
        guide=cfg.denoise_guide,
        taps=cfg.denoise_taps,
        g_radius=cfg.guided_radius,
        g_eps=cfg.guided_eps,
        img_w=img_w,
        ext_gain=gain is not None,
    )
    if windowed:
        return stripe_pallas_call_windowed(kernel, inputs, plan, xp.dtype,
                                           interpret=interpret)
    out = stripe_pallas_call(kernel, inputs, plan, xp.dtype,
                             interpret=interpret)
    return merge_stripes(out, plan)


def fused_retinex_ema(
    xp: jnp.ndarray,
    carry: jnp.ndarray,
    cfg: PipelineConfig,
    plan: StripePlan,
    alpha: float,
    img_w: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fully-fused temporally-stable retinex video step over a padded planar
    batch (config 4's TPU fast path): u8 normalize -> in-kernel illumination
    (max-RGB + separable blur) -> per-pixel EMA against ``carry`` (negative
    carry = uninitialized sentinel) -> temporally-relit gain -> bilateral
    denoise -> u8 quantize, PLUS the mixed illumination plane as a second
    output so the EMA state round-trips HBM exactly once per frame.

    Args:
      xp: (B, 3, Hp, Wp) padded canvas, uint8 (fast path) or f32 in [0, 1].
      carry: (B, Hp, Wp) f32 EMA illumination carry on the same canvas;
        pixels < 0 take this frame's illumination unmixed.
      plan: stripe plan for (Hp, Wp), sized with the EMA kernel's extra
        planes (see ``retinex_plan_bytes_per_px`` + 16).
      alpha: EMA new-frame weight (static — fixed per video stream).
      img_w: unpadded image width (restores the MARGIN column-replica
        invariant on the gain, as the jnp video path does).

    Returns ``(out, l_mix)``: rows [margin, margin + S*TH) of the enhanced
    canvas (dtype matches ``xp``) and of the mixed illumination plane (f32,
    (B, S*TH, Wp)). The caller re-derives carry rows outside the interior
    band by edge replication — those rows are never consumed (see
    video.video_step).
    """
    u8_io = xp.dtype == jnp.uint8
    if use_windowed(cfg.stripe_windowed, plan):
        inputs = [xp, carry[:, None].astype(jnp.float32)]
    else:
        x_stripes = jnp.transpose(extract_stripes(xp, plan),
                                  (0, 2, 1, 3, 4))
        c_stripes = jnp.transpose(
            extract_stripes(carry[:, None].astype(jnp.float32), plan),
            (0, 2, 1, 3, 4),
        )
        inputs = [x_stripes, c_stripes]
    kernel = functools.partial(
        _retinex_kernel,
        radius=cfg.blur_radius,
        sigma=cfg.blur_sigma,
        gamma=cfg.gamma,
        eps=cfg.illum_eps,
        inv2s2=1.0 / (2.0 * cfg.denoise_sigma * cfg.denoise_sigma),
        strength=cfg.denoise_strength,
        margin=plan.margin,
        th=plan.stripe_rows,
        u8_io=u8_io,
        dn_kind=cfg.denoise_kernel,
        guide=cfg.denoise_guide,
        taps=cfg.denoise_taps,
        g_radius=cfg.guided_radius,
        g_eps=cfg.guided_eps,
        ema_alpha=float(alpha),
        img_w=img_w,
    )
    if use_windowed(cfg.stripe_windowed, plan):
        out, lmix = stripe_pallas_call_windowed(
            kernel, inputs, plan, xp.dtype,
            interpret=interpret, extra_out=[(1, jnp.float32)],
        )
        return out, lmix[:, 0]
    out, lmix = stripe_pallas_call(
        kernel, inputs, plan, xp.dtype,
        interpret=interpret, extra_out=[(1, jnp.float32)],
    )
    return merge_stripes(out, plan), merge_stripes(lmix, plan)[:, 0]


def guided_tail_bytes_per_px(radius: int) -> int:
    """Resident VMEM bytes/pixel the in-kernel guided tail adds on top of a
    base kernel, for stripe planning. At r=2 the stats + per-channel a/b
    planes budget 32 B/px (8 f32 planes, validated by every r=2 config
    compiling within plan). Larger radii keep more live roll temporaries in
    the box-mean cascades: the decom-path Mosaic scoped peak measured
    127.9 B/px at r=4 where the flat +32 model planned 104 (a 16.86 MB
    scoped-vmem OOM, round 4) — anchor the slope at +12 B/px per radius
    step past 2."""
    return 32 + max(0, radius - 2) * 12


def retinex_plan_bytes_per_px(cfg: PipelineConfig) -> int:
    """Resident VMEM bytes/pixel of the retinex kernel for stripe sizing.
    The per-channel bilateral streams one channel at a time (~37 B/px
    measured, see plan_stripes docstring); the luma-guided joint bilateral
    must hold all 3 boosted channels + the guide + 3 accumulators + the
    weight plane live at once (~110 B/px measured from the Mosaic scoped
    peak: 28.7 MB over a 408x640 stripe). The guided tail additionally
    keeps the guide stats and per-channel a/b planes live
    (radius-dependent — ``guided_tail_bytes_per_px``)."""
    base = 120 if cfg.denoise_guide == "luma" else 40
    if cfg.denoise_taps == "guided":
        base += guided_tail_bytes_per_px(cfg.guided_radius)
    return base


def curve_plan_bytes_per_px(n_iter: int, ds: int = 1,
                            guide: str = "perchannel",
                            taps: str = "sep",
                            guided_radius: int = 2) -> int:
    """Resident VMEM bytes/pixel of the curve kernel for stripe sizing:
    n_iter*3 f32 map planes (1/ds rows when downsampled) + u8 in/out +
    working set. Mosaic's scoped-stack peak measured ~213 B/px for the
    ds=4 in-kernel row-upsample variant (it keeps several full-res f32
    temps live per iteration), so the working term is generous — a stripe
    that is too short only adds a little halo re-read. Sized against the
    14 MB plan budget so the scoped peak stays under Mosaic's 16 MB."""
    # Measured scoped peaks (v5e): ds=1 ~189 B/px, ds=4 ~213 B/px. The map
    # planes are low-res on BOTH axes (1/ds^2 pixels each) since the
    # in-kernel 2-D upsample landed; the flat working term carries the
    # full-res temporaries the upsample keeps live.
    base = n_iter * 3 * 4 // (ds * ds) + (150 if ds == 1 else 216)
    # luma guide additionally holds all 3 curve outputs + guide + accs live;
    # the guided tail its stats and a/b planes (radius-dependent)
    base += 48 if guide == "luma" else 0
    if taps == "guided":
        base += guided_tail_bytes_per_px(guided_radius)
    return base


def fused_retinex(
    xp: jnp.ndarray,
    cfg: PipelineConfig,
    plan: StripePlan,
    interpret: bool = False,
    stages=("blur", "boost", "denoise"),
    gain: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Run the fused kernel over a padded planar batch.

    Args:
      xp: (B, 3, Hp, Wp) padded canvas (see ``pipeline.pad_planar``). dtype
        uint8 (values 0..255, the fast path — conversion happens in-kernel)
        or float32 in [0, 1]; the output dtype matches.
      plan: stripe plan for (Hp, Wp).
      interpret: run in Pallas interpreter mode (CPU tests).

    Returns:
      (B, 3, S*TH, Wp) — padded rows [margin, margin + S*TH), so row 0 of
      the result is row 0 of the original unpadded image. Columns still carry
      the horizontal padding; the caller crops [margin, margin + W).
    """
    u8_io = xp.dtype == jnp.uint8
    if use_windowed(cfg.stripe_windowed, plan):
        # element-offset windows straight off the canvas: no XLA
        # extract/merge copies (striping.stripe_pallas_call_windowed)
        inputs = xp if gain is None else [
            xp, gain[:, None].astype(jnp.float32)]
    else:
        stripes = extract_stripes(xp, plan)  # (B, 3, S, THh, Wp)
        stripes = jnp.transpose(stripes, (0, 2, 1, 3, 4))
        inputs = stripes
        if gain is not None:
            # (B, Hp, Wp) f32 -> (B, S, 1, THh, Wp) alongside the image
            g_stripes = jnp.transpose(
                extract_stripes(gain[:, None].astype(jnp.float32), plan),
                (0, 2, 1, 3, 4),
            )
            inputs = [stripes, g_stripes]

    kernel = functools.partial(
        _retinex_kernel,
        radius=cfg.blur_radius,
        sigma=cfg.blur_sigma,
        gamma=cfg.gamma,
        eps=cfg.illum_eps,
        inv2s2=1.0 / (2.0 * cfg.denoise_sigma * cfg.denoise_sigma),
        strength=cfg.denoise_strength,
        margin=plan.margin,
        th=plan.stripe_rows,
        u8_io=u8_io,
        dn_kind=cfg.denoise_kernel,
        guide=cfg.denoise_guide,
        taps=cfg.denoise_taps,
        g_radius=cfg.guided_radius,
        g_eps=cfg.guided_eps,
        stages=tuple(stages),
        ext_gain=gain is not None,
    )
    if use_windowed(cfg.stripe_windowed, plan):
        return stripe_pallas_call_windowed(kernel, inputs, plan, xp.dtype,
                                           interpret=interpret)
    out = stripe_pallas_call(kernel, inputs, plan, xp.dtype,
                             interpret=interpret)
    return merge_stripes(out, plan)
