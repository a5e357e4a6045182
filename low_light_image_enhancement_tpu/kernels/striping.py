"""Halo-stripe planning shared by the fused kernels and the pipeline.

A padded image of ``Hp = S * TH + 2 * MARGIN`` rows is cut into ``S``
overlapping stripes of ``TH + 2 * MARGIN`` rows (stride ``TH``). Each Pallas
grid step consumes one stripe from HBM into VMEM, computes the full graph
with roll-based shifts (wrap corruption depth < MARGIN stays inside the
overlap), and writes back the central ``TH`` rows. Overlap is materialized
once by XLA (static slices + stack) — a ~(1 + 2*MARGIN/TH) read amplification,
negligible against HBM bandwidth at these sizes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class StripePlan(NamedTuple):
    n_stripes: int    # S
    stripe_rows: int  # TH (output rows per stripe, multiple of 8)
    padded_h: int     # Hp = S * TH + 2 * margin
    padded_w: int     # Wp (multiple of 128)
    margin: int


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Per-stripe VMEM budget for the kernel's *scoped* (stack) allocation.
# Mosaic's scoped-vmem limit is 16 MB; plans must keep the measured resident
# working set under it with headroom for Mosaic's own temporaries.
_VMEM_STRIPE_BUDGET = 14 * 1024 * 1024


def plan_stripes(
    h: int, w: int, margin: int, max_rows: int = 1024,
    bytes_per_px: int = 40,
) -> StripePlan:
    """Choose the largest VMEM-fitting stripe height (fewest stripes, least
    halo-overlap recompute) that tiles ``h``, hardware-aligned.

    ``bytes_per_px``: the kernel's MEASURED resident bytes per stripe pixel
    (Mosaic scoped-stack peak / stripe pixels). The retinex kernel keeps
    ~9-10 f32 planes live through the bilateral stage (~37 B/px measured on
    a v5e at 4K width: an 18.06 MB scoped peak for a 128x3968 stripe), so
    the f32-kernel default is 40; the curve kernel carries n_iter x 3 map
    planes on top (see ``fused_enhance.curve_plan_bytes_per_px``). A
    600x400 LOL image still plans as ONE stripe (no overlap copies)."""
    wp = _round_up(w + 2 * margin, 128)
    budget_rows = _VMEM_STRIPE_BUDGET // (bytes_per_px * wp) - 2 * margin
    cap = max(8, min(max_rows, (budget_rows // 8) * 8))
    # The 8-row floor can silently exceed the budget for very wide frames
    # with heavy kernels (e.g. curve n_iter=8 + luma guide at 4K width):
    # Mosaic's scoped-vmem limit is a hard 16 MB, so fail HERE with a
    # remedy instead of deep inside the Mosaic compile.
    floor_bytes = bytes_per_px * (cap + 2 * margin) * wp
    if floor_bytes > 16 * 1024 * 1024:
        raise ValueError(
            f"no VMEM-fitting stripe exists: width {w} x {bytes_per_px} "
            f"B/px needs {floor_bytes / 2**20:.1f} MB even at the 8-row "
            "minimum stripe (Mosaic scoped-vmem limit is 16 MB). Reduce "
            "the kernel's resident footprint (denoise_guide='perchannel', "
            "larger curve_downsample, fewer curve_iters) or shard the "
            "frame spatially over more devices."
        )
    s = max(1, -(-h // cap))
    th = _round_up(-(-h // s), 8)
    hp = s * th + 2 * margin
    return StripePlan(s, th, hp, wp, margin)


def extract_stripes(xp: jnp.ndarray, plan: StripePlan) -> jnp.ndarray:
    """(..., Hp, Wp) -> (..., S, TH + 2*margin, Wp) overlapping stripes.

    Static slices + stack so XLA lowers it to one concat copy.
    """
    thh = plan.stripe_rows + 2 * plan.margin
    stripes = [
        lax.slice_in_dim(xp, i * plan.stripe_rows, i * plan.stripe_rows + thh,
                         axis=-2)
        for i in range(plan.n_stripes)
    ]
    return jnp.stack(stripes, axis=-3)


def stripe_pallas_call(
    kernel,
    stripes,
    plan: StripePlan,
    out_dtype,
    interpret: bool = False,
    out_channels: int = 3,
    extra_out=None,
):
    """Run a per-stripe kernel over (B, S, C, THh, Wp) planar stripes.

    ``stripes`` may be one array or a sequence (e.g. image stripes + curve-map
    stripes); each gets a full halo'd VMEM block per grid step and the kernel
    receives one ref per array, in order, before the output ref. One grid
    step per (image, stripe); the kernel writes the central
    (out_channels, TH, Wp) block. Shared scaffolding for every planar stripe
    kernel so grid/BlockSpec conventions live once.

    ``extra_out``: optional list of (channels, dtype) for additional stripe
    outputs on the same (TH, Wp) interior grid (e.g. the video EMA kernel's
    mixed-illumination carry plane); the kernel receives one extra output
    ref per entry after the main one, and the call returns a tuple.
    """
    arrs = list(stripes) if isinstance(stripes, (list, tuple)) else [stripes]
    b = arrs[0].shape[0]

    def _ospec(ch):
        return pl.BlockSpec(
            (1, 1, ch, plan.stripe_rows, plan.padded_w),
            lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def _oshape(ch, dt):
        return jax.ShapeDtypeStruct(
            (b, plan.n_stripes, ch, plan.stripe_rows, plan.padded_w), dt
        )

    outs = [(out_channels, out_dtype)] + list(extra_out or [])
    res = pl.pallas_call(
        kernel,
        grid=(b, plan.n_stripes),
        in_specs=[
            # rows/cols come from each array: low-res side inputs (e.g. the
            # curve kernel's 1/ds-row maps) get proportionally small blocks
            pl.BlockSpec(
                (1, 1, a.shape[2], a.shape[3], a.shape[4]),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for a in arrs
        ],
        out_specs=[_ospec(ch) for ch, _ in outs] if extra_out
        else _ospec(out_channels),
        out_shape=[_oshape(ch, dt) for ch, dt in outs] if extra_out
        else _oshape(out_channels, out_dtype),
        interpret=interpret,
    )(*arrs)
    return tuple(res) if extra_out else res


def use_windowed(stripe_windowed, plan: StripePlan) -> bool:
    """Resolve PipelineConfig.stripe_windowed (None = auto) for a plan.

    Measured on-chip A/B (round 5, docs/PERFORMANCE.md stripe-window
    section): the windowed form wins where the extract/merge copies are a
    large fraction of the program (600x400 b48: +7.6% full program, +8.3%
    canvas path), is flat at 1080p, and LOSES ~9% at 4K width (945 vs
    1042 fps b1) — the element-offset window DMA pays more per byte than
    the contiguous pre-packed stripes at very wide rows. Auto keeps the
    windowed path up to 1080p-class widths and the stripes form beyond.
    """
    if stripe_windowed is not None:
        return bool(stripe_windowed)
    return plan.padded_w <= 2048


def windows_aligned(plan: StripePlan, ds: int = 1) -> bool:
    """Whether the windowed form's blocks satisfy Mosaic's divisibility
    rule (last two block dims divisible by (8, 128) or equal to the full
    array dims) for a main canvas plus a 1/ds low-res side input.

    The main canvas always aligns (TH is an 8-multiple, margins keep
    thh = TH + 2m an 8-multiple, widths are full-dim windows). A 1/ds
    side input (the curve kernel's low-res maps) windows (TH + 2m)/ds
    rows with stride TH/ds — both must be 8-multiples, which ds in
    {2, 4} rarely satisfies; callers fall back to the stripes form
    there (the maps are ds^2 smaller than the image, so the extract
    copy being saved is small anyway)."""
    if ds == 1:
        return True
    thh = plan.stripe_rows + 2 * plan.margin
    return (
        plan.stripe_rows % ds == 0
        and thh % ds == 0
        and (thh // ds) % 8 == 0
        and (plan.stripe_rows // ds) % 8 == 0
    )


def stripe_pallas_call_windowed(
    kernel,
    canvases,
    plan: StripePlan,
    out_dtype,
    interpret: bool = False,
    out_channels: int = 3,
    extra_out=None,
):
    """Overlapping-window form of :func:`stripe_pallas_call` (round 5,
    VERDICT r4 item 8): the kernel's input windows come straight off the
    padded canvas via element-offset BlockSpecs (``pl.Element`` row dim,
    start ``j * TH``), so the overlapped stripes are DMA'd HBM->VMEM by
    Pallas's own double-buffered pipeline — the XLA pre-pass that
    materialized them (``extract_stripes``: canvas read + stripes write)
    and the post-pass that re-assembled rows (``merge_stripes``: a full
    transpose copy) both disappear. Outputs write directly into the
    (B, C, S*TH, Wp) row canvas. Saves ~2 full-canvas HBM round-trips per
    call; measured 1.6x on the canvas-I/O headline path (docs/
    PERFORMANCE.md stripe-window section).

    ``canvases``: one (B, C, Hp, Wp) array or a sequence (image + side
    inputs); every array is windowed on the same row schedule, scaled by
    its own row count (low-res side inputs divide evenly). The kernel
    sees the same (1, 1, C, THh, Wp) block shapes as the stripes form, so
    the SAME kernel body serves both calls (refs indexed [0, 0]).
    """
    from jax._src.pallas.core import Element  # part of pl.BlockSpec's
    # public BlockDim union; not yet re-exported under pl (jax 0.9)

    arrs = list(canvases) if isinstance(canvases, (list, tuple)) \
        else [canvases]
    b = arrs[0].shape[0]
    thh = plan.stripe_rows + 2 * plan.margin

    def _in_spec(a):
        # Mosaic requires all-or-none Element dims; starts are element
        # offsets throughout (row start j*stride overlaps adjacent windows)
        c, rows = a.shape[1], a.shape[2]
        if rows == arrs[0].shape[2]:
            win, stride = thh, plan.stripe_rows
        else:  # low-res side input (e.g. 1/ds curve maps)
            ds = arrs[0].shape[2] // rows
            win, stride = thh // ds, plan.stripe_rows // ds
        return pl.BlockSpec(
            (Element(1), Element(1), Element(c), Element(win),
             Element(a.shape[-1])),
            lambda i, j, _s=stride: (i, 0, 0, j * _s, 0),
            memory_space=pltpu.VMEM,
        )

    def _ospec(ch):
        return pl.BlockSpec(
            (Element(1), Element(1), Element(ch),
             Element(plan.stripe_rows), Element(plan.padded_w)),
            lambda i, j: (i, 0, 0, j * plan.stripe_rows, 0),
            memory_space=pltpu.VMEM,
        )

    def _oshape(ch, dt):
        return jax.ShapeDtypeStruct(
            (b, 1, ch, plan.n_stripes * plan.stripe_rows, plan.padded_w),
            dt,
        )

    outs = [(out_channels, out_dtype)] + list(extra_out or [])
    res = pl.pallas_call(
        kernel,
        grid=(b, plan.n_stripes),
        in_specs=[_in_spec(a) for a in arrs],
        out_specs=[_ospec(ch) for ch, _ in outs] if extra_out
        else _ospec(out_channels),
        out_shape=[_oshape(ch, dt) for ch, dt in outs] if extra_out
        else _oshape(out_channels, out_dtype),
        interpret=interpret,
    )(*(a[:, None] for a in arrs))
    if extra_out:
        return tuple(r[:, 0] for r in res)
    return res[:, 0]


def merge_stripes(out: jnp.ndarray, plan: StripePlan) -> jnp.ndarray:
    """(..., S, C, TH, Wp) stripe outputs -> (..., C, S*TH, Wp) row canvas
    (padded rows [margin, margin + S*TH) of the original canvas)."""
    *lead, s, c, th, wp = out.shape
    perm = list(range(len(lead))) + [len(lead) + 1, len(lead), len(lead) + 2,
                                     len(lead) + 3]
    return jnp.transpose(out, perm).reshape(*lead, c, s * th, wp)
