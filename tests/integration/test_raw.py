"""RAW (Bayer) ingest: the on-device ISP front-end fused into the enhance
graph (`EnhancePipeline.enhance_raw`; ops.isp per PAPERS.md:5-7 — the
RAW->sRGB / demosaic-bridging-enhancement family).

Spec anchors: BASELINE.json north_star's host-decode -> device graph contract
extends to RAW captures here; the reference repo has no code at all
(/root/reference/README.md:1-2), so the checkable contract is parity between
the fused single-program path and the explicit two-stage composition
(ISP program -> standard enhance), which must be bit-exact.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.data.synth import synth_pair
from low_light_image_enhancement_tpu.ops.isp import raw_to_srgb
from low_light_image_enhancement_tpu.ops.colorspace import quantize_u8
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


def _mosaic_from_rgb(rgb_u8: np.ndarray) -> np.ndarray:
    """(H, W, 3) u8 -> (H, W) f32 RGGB mosaic (inverse of an ideal demosaic:
    keep each pixel's own Bayer-site channel)."""
    h, w, _ = rgb_u8.shape
    x = rgb_u8.astype(np.float32) / 255.0
    raw = np.empty((h, w), np.float32)
    raw[0::2, 0::2] = x[0::2, 0::2, 0]
    raw[0::2, 1::2] = x[0::2, 1::2, 1]
    raw[1::2, 0::2] = x[1::2, 0::2, 1]
    raw[1::2, 1::2] = x[1::2, 1::2, 2]
    return raw


def _mosaics(n=2, h=48, w=64):
    return np.stack(
        [_mosaic_from_rgb(synth_pair(i, h, w)[0]) for i in range(n)]
    )


def test_enhance_raw_shape_dtype_and_brightening():
    raw = _mosaics(1)[0]
    pipe = EnhancePipeline()
    out = pipe.enhance_raw(raw)
    assert out.shape == (48, 64, 3) and out.dtype == np.uint8
    # enhanced output must be brighter than the un-enhanced sRGB render
    srgb = np.asarray(quantize_u8(raw_to_srgb(jnp.asarray(raw))))
    assert out.astype(np.float64).mean() > srgb.astype(np.float64).mean() * 1.1


def _isp_reference(raws: np.ndarray) -> np.ndarray:
    """Explicit staged ISP reference: reflect-padded demosaic, then
    gray-world gains computed on the CROPPED region (ADVICE r4: padded
    statistics double-weighted the 2 px borders), then WB/CCM/gamma."""
    from low_light_image_enhancement_tpu.ops.isp import (
        DEFAULT_CCM,
        color_correction,
        demosaic_bilinear_rggb,
        gray_world_gains,
    )

    rp = jnp.pad(jnp.asarray(raws), ((0, 0), (2, 2), (2, 2)), mode="reflect")
    rgb = demosaic_bilinear_rggb(rp)[..., 2:-2, 2:-2]
    gains = gray_world_gains(rgb).reshape(-1, 3, 1, 1)
    rgb = color_correction(jnp.clip(rgb * gains, 0.0, 1.0), DEFAULT_CCM)
    srgb = jnp.clip(rgb, 0.0, 1.0) ** (1.0 / 2.2)
    return np.asarray(jnp.transpose(quantize_u8(srgb), (0, 2, 3, 1)))


def test_enhance_raw_fused_matches_two_stage_composition():
    """The fused raw program must equal ISP-stage -> enhance_batch exactly
    (same floats: both run the reflect-padded demosaic with crop-region
    gray-world gains, then the standard u8 graph)."""
    raws = _mosaics(2)
    pipe = EnhancePipeline()
    fused = pipe.enhance_raw_batch(raws)
    staged = pipe.enhance_batch(_isp_reference(raws))
    np.testing.assert_array_equal(fused, staged)


def test_gray_world_gains_computed_on_cropped_region():
    """Auto-WB statistics must come from the real image pixels, not the
    reflect-padded canvas: the ISP program's output equals the explicit
    crop-gains composition (ops.isp.gray_world_gains of the cropped
    demosaic)."""
    from low_light_image_enhancement_tpu.ops.isp import DEFAULT_CCM

    raws = _mosaics(1)
    pipe = EnhancePipeline()
    ccm_key = tuple(tuple(float(v) for v in row)
                    for row in np.asarray(DEFAULT_CCM))
    isp_out = np.asarray(
        pipe._compiled_isp(1, 48, 64, None, ccm_key,
                           1.0 / 2.2)(jnp.asarray(raws))
    )
    np.testing.assert_array_equal(isp_out, _isp_reference(raws))


def test_enhance_raw_dtype_equivalence():
    """uint16 (full-scale 65535), uint8, and f32 encodings of the same
    mosaic give nearly identical outputs (u16 quantization is far below the
    u8 output step)."""
    raw = _mosaics(1)[0]
    pipe = EnhancePipeline()
    out_f = pipe.enhance_raw(raw)
    out_u16 = pipe.enhance_raw((raw * 65535.0 + 0.5).astype(np.uint16))
    out_u8 = pipe.enhance_raw((raw * 255.0 + 0.5).astype(np.uint8))
    assert np.abs(out_f.astype(int) - out_u16.astype(int)).max() <= 1
    assert np.abs(out_f.astype(int) - out_u8.astype(int)).max() <= 3


def test_enhance_raw_white_level():
    """12-bit data in a u16 container: white_level=4095 must match the f32
    encoding; the default 65535 scaling would leave it 16x too dark."""
    raw = _mosaics(1)[0]
    r12 = (raw * 4095.0 + 0.5).astype(np.uint16)
    pipe = EnhancePipeline()
    out = pipe.enhance_raw(r12, white_level=4095)
    ref = pipe.enhance_raw(raw)
    # 12-bit quantization (1/4095) through the 1/2.2 display gamma steepens
    # near black (d/dx x^0.45 -> inf at 0), so allow 2 u8 steps.
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2


def test_enhance_raw_explicit_wb_and_learned_method():
    """Explicit WB gains are honored (vs gray-world) and the raw front-end
    composes with a learned method end-to-end."""
    raw = _mosaics(1)[0]
    pipe = EnhancePipeline(PipelineConfig(method="curve", curve_downsample=2))
    out_gw = pipe.enhance_raw(raw)
    out_wb = pipe.enhance_raw(raw, wb_gains=(2.0, 1.0, 1.5))
    assert out_gw.shape == out_wb.shape == (48, 64, 3)
    assert not np.array_equal(out_gw, out_wb)


def test_enhance_raw_sharded_route_matches_single_device():
    """spatial_shards>1 routes ISP -> sharded enhance; output must match the
    single-device config (the sharded graph's bit-parity contract)."""
    raws = _mosaics(1, h=128, w=64)
    single = EnhancePipeline(PipelineConfig()).enhance_raw_batch(raws)
    sharded = EnhancePipeline(
        PipelineConfig(spatial_shards=4)
    ).enhance_raw_batch(raws)
    d = np.abs(single.astype(int) - sharded.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_enhance_raw_validation():
    pipe = EnhancePipeline()
    with pytest.raises(ValueError, match="even"):
        pipe.enhance_raw(np.zeros((47, 64), np.float32))
    with pytest.raises(ValueError, match="Bayer"):
        pipe.enhance_raw(np.zeros((4, 48, 64), np.float32))
    with pytest.raises(ValueError, match="Bayer"):
        pipe.enhance_raw_batch(np.zeros((48, 64), np.float32))


def test_enhance_raw_rejects_integer_container_dtypes():
    """int16/int32 RAW containers must raise, not be clipped to an
    all-white [0,1] image (ADVICE r4, medium)."""
    pipe = EnhancePipeline()
    for dt in (np.int16, np.int32, np.int64):
        with pytest.raises(ValueError, match="unsupported mosaic dtype"):
            pipe.enhance_raw(np.full((48, 64), 2000, dt))


def test_enhance_raw_white_level_requires_uint16():
    pipe = EnhancePipeline()
    with pytest.raises(ValueError, match="white_level"):
        pipe.enhance_raw(np.zeros((48, 64), np.uint8), white_level=4095)
    with pytest.raises(ValueError, match="white_level"):
        pipe.enhance_raw(np.zeros((48, 64), np.float32), white_level=4095)


def test_enhance_raw_clips_above_white_level():
    """u16 DNs above a sub-65535 white level saturate instead of entering
    the demosaic >1 and skewing gray-world stats (ADVICE r4)."""
    raw = _mosaics(1)[0]
    r12 = (raw * 4095.0 + 0.5).astype(np.uint16)
    hot = r12.copy()
    hot[10, 10] = 6000  # defective pixel above the 12-bit white level
    pipe = EnhancePipeline()
    out_hot = pipe.enhance_raw(hot, white_level=4095)
    sat = r12.copy()
    sat[10, 10] = 4095
    out_sat = pipe.enhance_raw(sat, white_level=4095)
    np.testing.assert_array_equal(out_hot, out_sat)


def test_enhance_raw_bucket_bounds_compiles_and_matches_interior():
    """With ``bucket`` set, RAW mosaics are phase-preserving reflect-padded
    to bucket multiples (bounded compile count, ADVICE r4); the interior
    away from the padded border matches the unbucketed result exactly
    (gray-world stats restrict to the real image region)."""
    raws = _mosaics(1)
    plain = EnhancePipeline().enhance_raw_batch(raws)
    pipe = EnhancePipeline(bucket=32)
    bucketed = pipe.enhance_raw_batch(raws)
    assert bucketed.shape == plain.shape
    # two mosaics of different sizes share one bucketed raw program
    raws2 = _mosaics(1, h=40, w=60)
    out2 = pipe.enhance_raw_batch(raws2)
    assert out2.shape == (1, 40, 60, 3)
    raw_keys = [k for k in pipe._cache if k and k[0] == "raw"]
    assert len(raw_keys) == 1, raw_keys
    # interior parity: only pixels within the receptive field of the
    # padded (bottom/right) border may differ
    np.testing.assert_array_equal(bucketed[:, :32, :48], plain[:, :32, :48])


def test_cli_rejects_out_of_range_int_npy(tmp_path):
    from low_light_image_enhancement_tpu.cli import _load_raw_mosaic

    bad = tmp_path / "bad.npy"
    np.save(bad, np.full((48, 64), -5, np.int32))
    with pytest.raises(ValueError, match="outside"):
        _load_raw_mosaic(str(bad))
    ok = tmp_path / "ok.npy"
    np.save(ok, np.full((48, 64), 2000, np.int32))
    arr = _load_raw_mosaic(str(ok))
    assert arr.dtype == np.uint16 and arr[0, 0] == 2000


def test_cli_enhance_raw(tmp_path):
    from low_light_image_enhancement_tpu.cli import main
    from low_light_image_enhancement_tpu.io.codec import decode_image

    raw = (_mosaics(1)[0] * 65535.0).astype(np.uint16)
    src = tmp_path / "mosaic.npy"
    np.save(src, raw)
    out = tmp_path / "out.png"
    assert main(["enhance", str(src), str(out), "--raw",
                 "--wb-gains", "1.8,1.0,1.4"]) == 0
    img = decode_image(str(out))
    assert img.shape == (48, 64, 3)
