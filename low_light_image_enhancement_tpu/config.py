"""Pipeline configuration.

Plain frozen dataclasses (hashable → usable as jit static args / cache keys).
One named preset per benchmark config in BASELINE.json:6-12.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Edge-replicate padding margin of the device graph's canvas at the DEFAULT
# config (blur radius 2 + radius-1 bilateral = receptive radius 3 -> 4).
# Round 4 (VERDICT r3 item 3): the margin is no longer a global invariant —
# configs whose per-pixel tail has a larger receptive radius (the guided-
# filter tail: radius 2*guided_radius) get a wider canvas via
# ``canvas_margin(cfg)``; every canvas/plan/halo/band computation derives
# from that. MARGIN stays exported as the floor (and the exact value every
# pre-round-4 config resolves to, so all margin-4 geometry is bit-unchanged).
MARGIN = 4


def denoise_radius(cfg: "PipelineConfig") -> int:
    """Receptive radius (pixels) of the configured denoise tail: radius-1
    bilateral taps, or the guided filter's two cascaded radius-r box means
    (stats, then the a/b smoothing) = 2*r."""
    if cfg.denoise_strength <= 0.0:
        return 0
    if cfg.denoise_taps == "guided":
        return 2 * cfg.guided_radius
    return 1


def canvas_margin(cfg: "PipelineConfig") -> int:
    """Edge-replicate margin of the padded canvas for ``cfg``: the total
    receptive radius of the per-pixel tail (illumination blur where the
    method has one, plus the denoise radius), floored at MARGIN and rounded
    to a sublane multiple above it (8 also keeps the curve/hybrid ds
    divisibility for every allowed curve_downsample). All pre-guided
    configs resolve to exactly MARGIN=4 — geometry unchanged."""
    # The denoise taps at the first consumed row reach denoise_radius rows
    # toward the canvas edge; those rows must be clear of every wrap-roll
    # corruption band. The corruption sources are PARALLEL (each measured
    # from the canvas edge, none feeds another): the illumination blur's
    # radius, and the fused tail's in-kernel map upsample (ds in {2, 4}
    # only; ds=8 upsamples in XLA with clamp shifts) wrapping ds/2 rows.
    edge = 0
    if cfg.method in ("retinex", "hybrid"):
        edge = cfg.blur_radius
    if cfg.method in ("curve", "hybrid") and cfg.curve_downsample in (2, 4):
        edge = max(edge, cfg.curve_downsample // 2)
    r = denoise_radius(cfg) + edge
    return MARGIN if r <= MARGIN else -(-r // 8) * 8

_METHODS = ("retinex", "curve", "hybrid", "fcn", "decom")


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Configuration of the enhancement device graph.

    All fields are Python scalars so the dataclass is hashable and a config
    change maps to exactly one XLA recompile.
    """

    # --- algorithm selection -------------------------------------------------
    # "retinex": classical illumination-map / reflectance path (no weights).
    # "curve":   Zero-DCE-style learned curve adjustment (needs CNN params).
    # "hybrid":  retinex illumination boost followed by learned curves.
    # "fcn":     supervised context-aggregation FCN enhancer (paired data).
    # "decom":   learned Retinex decomposition (RetinexNet-style) + relight.
    method: str = "retinex"

    # --- retinex / gamma -----------------------------------------------------
    gamma: float = 0.45          # illumination brightening exponent (<1 brightens)
    decom_gamma: float = 0.08    # decom method's illumination exponent in
                                 # y = R * L**decom_gamma. The equal-R loss
                                 # pins R near the well-lit reflectance, so a
                                 # much flatter L than retinex's boost is
                                 # optimal (eval sweep: 0.08 -> 19.4 dB/0.613
                                 # SSIM vs 10.4 dB at the retinex gamma)
    illum_eps: float = 1e-3      # floor for illumination before division
    blur_radius: int = 2         # Gaussian radius for illumination smoothing
    blur_sigma: float = 1.0      # Gaussian sigma for illumination smoothing

    # --- denoise -------------------------------------------------------------
    denoise_strength: float = 1.0   # 0 disables; blend factor toward the
                                    # filtered image. Full blend measured
                                    # better on EVERY method and metric on
                                    # the hardened eval set (with the sigma
                                    # default below: retinex SSIM 0.32 ->
                                    # 0.505, decom 0.63 -> 0.742 — the
                                    # round-3 quality table in
                                    # docs/PERFORMANCE.md is the record);
                                    # the bilateral is edge-preserving so
                                    # full blend does not smear edges.
                                    # Kernel cost identical (the blend is
                                    # one in-kernel lerp).
    denoise_sigma: float = 0.2      # range sigma of the bilateral-lite
                                    # filter. Swept at full blend on the
                                    # hardened eval set: 0.12->0.2 gains
                                    # +0.024 SSIM (curve) / +0.009
                                    # (retinex) while a 0.5-contrast edge
                                    # still weighs only e^-3.1 ~= 0.04
                                    # (strongly edge-preserving); past 0.3
                                    # the gains (<+0.01 to sigma=3) come
                                    # from degrading toward a plain box
                                    # blur that the synthetic noise
                                    # rewards, so 0.2 is the ship point.
    denoise_kernel: str = "exp"     # range weight: "exp" (classic Gaussian
                                    # bilateral, the default) or "epan"
                                    # (squared Epanechnikov, transcendental-
                                    # free — measured perf-neutral on TPU;
                                    # see ops/denoise.py)
    denoise_taps: str = "sep"       # "sep" (default): separable 3+3-tap
                                    # bilateral — +37% measured pipeline
                                    # throughput at measured-identical eval
                                    # quality (the tap count IS the
                                    # bilateral's cost on the VPU — see
                                    # docs/PERFORMANCE.md); "full": the
                                    # exact 9-tap 3x3 bilateral; "guided":
                                    # the guided-filter tail (He et al.,
                                    # radius guided_radius box-mean
                                    # cascade) — the measured quality
                                    # lever on the classical path (SSIM
                                    # 0.56-0.61 vs the bilateral's 0.505
                                    # at the op-level probe); widens the
                                    # canvas margin (canvas_margin)
    guided_radius: int = 2          # box radius of the guided tail (only
                                    # read when denoise_taps="guided");
                                    # receptive radius is 2x this
    # Guided-filter edge/flat variance threshold. 1e-2 measured better than
    # 3e-3 on EVERY method at both radii (retinex r=2 SSIM 0.599 -> 0.636,
    # decom 0.889 -> 0.892; docs/PERFORMANCE.md guided table) — round 4
    # default change.
    guided_eps: float = 1e-2
                                    # threshold (guide is in [0, 1])
    denoise_guide: str = "luma"     # "luma" (default): joint bilateral
                                    # guided by the channel-mean luminance —
                                    # one weight plane per tap, chroma
                                    # smoothing aligned with luminance edges
                                    # (measured: perf-neutral, +0.3 dB /
                                    # +0.03 SSIM over "perchannel" on the
                                    # eval set); "perchannel": independent
                                    # range weights per channel

    # --- curve CNN -----------------------------------------------------------
    curve_iters: int = 8         # LE-curve iterations (Zero-DCE uses 8)
    curve_features: int = 32     # conv width of the curve estimator
    curve_downsample: int = 1    # estimate curves at 1/N resolution and
                                 # bilinearly upsample the maps (curves are
                                 # spatially smooth by construction — the TV
                                 # loss — so N=4 loses almost nothing)

    # --- execution -----------------------------------------------------------
    use_pallas: bool = True      # fuse the per-pixel graph into a Pallas kernel
    stripe_rows: int = 1024      # cap on Pallas stripe height (rows/grid step);
                                 # actual height is VMEM-budgeted (striping.py)
    stripe_windowed: Optional[bool] = None
                                 # True: overlapping input windows come
                                 # straight off the padded canvas via
                                 # element-offset BlockSpecs (Pallas's own
                                 # double-buffered DMA), skipping the XLA
                                 # extract/merge canvas copies (round 5,
                                 # VERDICT r4 item 8 — measured +7.6% on
                                 # the 600x400 headline program, +8.3% on
                                 # the canvas path, ~flat at 1080p,
                                 # MINUS 9% at 4K width; bit-exact).
                                 # False: the round-4 stripes form
                                 # (extract_stripes + merge_stripes), the
                                 # A/B reference. None (default): auto —
                                 # windowed up to 1080p-class widths,
                                 # stripes beyond
                                 # (striping.use_windowed).
    compute_dtype: str = "bfloat16"  # CNN conv compute dtype (the MXU-fed
                                 # models: curve/fcn/decom). bf16 measured
                                 # +45% fcn inference at IDENTICAL eval
                                 # PSNR/SSIM (docs/PERFORMANCE.md); the
                                 # fused kernels' per-pixel tap math stays
                                 # f32 regardless. Set "float32" for the
                                 # bit-exact-vs-f32-reference path.

    conv_impl: str = "auto"      # conv-stack lowering for the learned
                                 # models' INFERENCE path:
                                 # "auto": measured per-method policy
                                 # (blocks.AUTO_CONV_BANDS; docs/
                                 # PERFORMANCE.md round-3 conv tables) —
                                 # "packed" on TPU at small batch (2.7x
                                 # fcn at batch 8), "xla" at large batch
                                 # (XLA's conv lowering scales with
                                 # batch) and off-TPU. No band selects
                                 # packed12 (a measured e2e negative).
                                 # "xla": lax.conv_general_dilated as-is.
                                 # "pallas": dense-9-tap packed GEMM Pallas
                                 # kernel (kernels/mxu_conv.py) on s2d
                                 # activations — the MXU fast path (TPU
                                 # only; training always uses XLA convs).
                                 # "gemm": the pure-jnp GEMM reformulation
                                 # of ops/patch_conv.py — measured SLOWER
                                 # than "xla" under XLA fusion (slab
                                 # gathers materialize in HBM); kept as the
                                 # kernel's reference and fallback.
                                 # "packed": space-to-depth block conv —
                                 # ONE XLA conv per layer on packed lanes
                                 # (ops.patch_conv.conv2d_block_xla), 4x
                                 # lane fill at 4x structural FLOPs;
                                 # differentiable, runs everywhere.
                                 # "packed12": the (1, 2) half-packing —
                                 # 2x lane fill at only 2x structural
                                 # FLOPs, for the mid-batch regime between
                                 # packed's small-batch win and xla's
                                 # large-batch win.
                                 # "cascade": ONE Pallas kernel chaining
                                 # the whole dilated conv stack through
                                 # VMEM line buffers (fcn only — other
                                 # methods degrade to 'xla'; TPU only).
                                 # kernels/fcn_cascade.py.

    # --- sharding (config 5) -------------------------------------------------
    spatial_shards: int = 1      # >1: shard H across `spatial` mesh axis
    data_shards: int = 1         # >1: shard batch across `data` mesh axis

    # Named shipped weights this config pairs with (models.weights.NAMED),
    # overriding the per-method default — a preset whose quality number was
    # measured with specific weights carries them (round 5: the quality
    # preset's guided tail pairs with guided-in-loss-trained weights; tail
    # choice is part of the training contract, docs/PERFORMANCE.md).
    # None = the method's default .npz. Explicit model_params still win.
    weights_name: Optional[str] = None
                                 # (DP inference/serving; the batch-sharded
                                 # program compiles with no collectives —
                                 # tests/parallel/test_dp_scaling.py — so n
                                 # chips run it at ~n x throughput)

    def __post_init__(self):
        if self.method not in _METHODS:
            raise ValueError(
                f"unknown method {self.method!r}; choose from {_METHODS}"
            )
        if self.blur_radius < 1 or self.blur_sigma <= 0:
            raise ValueError("blur_radius >= 1 and blur_sigma > 0 required")
        if not 0.0 <= self.denoise_strength <= 1.0:
            raise ValueError("denoise_strength must be in [0, 1]")
        if self.denoise_strength > 0.0 and self.denoise_sigma <= 0:
            raise ValueError("denoise_sigma must be > 0")
        from low_light_image_enhancement_tpu.ops.denoise import (
            GUIDES,
            RANGE_KERNELS,
            TAPS,
        )

        if self.denoise_kernel not in RANGE_KERNELS:
            raise ValueError(
                f"denoise_kernel must be one of {RANGE_KERNELS}: "
                f"{self.denoise_kernel!r}"
            )
        if self.denoise_guide not in GUIDES:
            raise ValueError(
                f"denoise_guide must be one of {GUIDES}: "
                f"{self.denoise_guide!r}"
            )
        if self.denoise_taps not in TAPS:
            raise ValueError(
                f"denoise_taps must be one of {TAPS}: {self.denoise_taps!r}"
            )
        if self.denoise_taps == "guided" and not 1 <= self.guided_radius <= 8:
            raise ValueError(
                f"guided_radius must be in [1, 8]: {self.guided_radius} "
                "(receptive radius 2*r sets the canvas margin; 8 is already "
                "a 32-row margin)"
            )
        if self.denoise_taps == "guided" and self.guided_eps <= 0:
            raise ValueError("guided_eps must be > 0")
        if self.conv_impl not in ("auto", "xla", "pallas", "gemm", "packed",
                                  "packed12", "cascade"):
            raise ValueError(
                "conv_impl must be 'auto', 'xla', 'pallas', 'gemm', "
                f"'packed', 'packed12' or 'cascade': {self.conv_impl!r}"
            )
        if self.curve_downsample not in (1, 2, 4, 8):
            raise ValueError(
                "curve_downsample must be 1, 2, 4 or 8 (the integer-factor "
                "bilinear upsample of record and the sharded/striped phase "
                "alignment need a small even factor)"
            )
        if self.spatial_shards < 1 or self.data_shards < 1:
            raise ValueError(
                "spatial_shards and data_shards must be >= 1: "
                f"{self.spatial_shards}, {self.data_shards}"
            )
        if self.spatial_shards > 1 and self.data_shards > 1:
            raise ValueError(
                "combined data+spatial sharding is driven via "
                "parallel.make_mesh(n_data, n_spatial) + "
                "enhance_spatial_sharded, not PipelineConfig; set only one "
                "of spatial_shards / data_shards here"
            )

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


# Named presets mirroring the five benchmark configs (BASELINE.json:6-12).
PRESETS = {
    # 1. Single LOL 600x400 image: Retinex decomposition + gamma enhance,
    #    CPU JAX, parity vs the pure-jnp reference path.
    "config1_single_cpu": PipelineConfig(method="retinex", use_pallas=False),
    # 2. LOL eval-15 batched inference, fused decode->enhance->encode, 1 core.
    "config2_lol_eval": PipelineConfig(method="retinex", use_pallas=True),
    # 3. Zero-DCE-style curve CNN at 512x512 batch-64 on a v5e chip.
    "config3_curve_cnn": PipelineConfig(method="curve", use_pallas=True),
    # 4. 1080p streaming enhancement with double-buffered prefetch.
    "config4_1080p_stream": PipelineConfig(method="retinex", use_pallas=True),
    # 5. 4K sharded via shard_map across a v5e-8 slice, per-shard denoise.
    "config5_4k_sharded": PipelineConfig(
        method="retinex", use_pallas=True, spatial_shards=8
    ),
    # Measured quality frontier (round 5): decomposition head trained with
    # the materialized-relit-image objective THROUGH the guided tail
    # (weights decom_relit_guided) + in-kernel guided tail at radius 4 —
    # 20.14 dB / 0.921 SSIM / dE 17.9 on eval-15 (round 4's
    # inference-tuned frontier was 19.73 / 0.918 / 18.6; training through
    # the shipping tail bought all three metrics —
    # docs/PERFORMANCE.md guided-in-loss round-5 section). The
    # throughput pick stays the default retinex pipeline.
    "quality": PipelineConfig(
        method="decom", denoise_taps="guided", guided_radius=4,
        weights_name="decom_relit_guided",
    ),
    # Fastest learned path that still beats every classical metric:
    # supervised FCN with the default bilateral tail (18.8 dB / 0.89).
    "quality_fast": PipelineConfig(method="fcn"),
}
