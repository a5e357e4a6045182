"""Multi-layer fused FCN conv cascade — one Pallas kernel for the whole
dilated 24-channel stack (VERDICT r3 item 2: small-batch learned
throughput).

The round-3 finding: per-layer conv kernels re-stage activations through
HBM between layers (each boundary is a full (H2, W2, 96) bf16 plane out
and back), and at small batch neither the MXU nor HBM saturates — the
pipeline sits in launch/occupancy overhead. This kernel chains fcn layers
2..7 (the six 96-lane dense-9 packed GEMM layers; the 3-channel stem and
the 1x1 sigmoid head stay in XLA where they are cheap) inside ONE
``pallas_call`` using a **line-buffer cascade**, the classic systolic
image-pipeline structure:

* The grid walks row bands of ``R`` packed rows top-to-bottom
  (``grid=(B, nb)``; TPU Pallas grids execute sequentially, and VMEM
  scratch persists across grid steps).
* Each layer keeps a rolling VMEM buffer of its most recent
  ``R + 2*step_next`` output rows. Per band, every layer computes its next
  ``R`` rows — **lagged** by the cumulative step of the layers above it —
  reading only rows its producer has already emitted. No halo recompute,
  no HBM round-trips: activations cross layer boundaries through VMEM
  registers exactly once.
* Rows computed beyond the image (the lag region and the zero-padded
  canvas) are masked to zero so every layer sees exactly conv-SAME
  zero-padding semantics — bit-matching the per-layer reference
  (``models.fcn.apply_fcn`` / ``conv2d_dense9_mxu``'s halo convention).
* Each layer's conv is the dense-9-tap packed GEMM of
  ``kernels/mxu_conv.py`` (full-width stores + one big-K dot; even
  dilation d = block shift d/2 with phase-preserving weight structure) —
  the formulation measured at ~100 TF/s dense on this chip, and the one
  that needs NO lane-rotate primitives (the recorded Mosaic blocker for
  fused multi-layer forms, docs/PERFORMANCE.md round-3 conv section).

Inference-only (no VJP); training keeps XLA convs.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from low_light_image_enhancement_tpu.kernels.mxu_conv import (
    _ACTS,
    _TAPS,
    _round_up,
    pack_dense9_weights,
)

# Band-rows cap per grid step; the actual R is VMEM-planned per call.
_R = 8
# S-assembly sub-chunk rows: bounds the (c*W2, 9*128) staging buffer.
_CHUNK = 4
# Scratch budget for the planner. Empirically bisected on this toolchain:
# the remote tpu_compile_helper CRASHES (exit 1, no Mosaic diagnostic)
# when the kernel's scratch set reaches ~12 MB — well under the nominal
# 16 MB scoped-vmem limit — so plan against 10.5 MB (the full fcn stack
# compiles and runs at R=4, ~10 MB).
_VMEM_BUDGET = int(10.5 * 1024 * 1024)


def _plan_band_rows(w2: int, lanes: int, lpad: int, steps,
                    dtype_bytes: int = 2) -> int:
    """Largest band height R in {cap, ..., 4} whose rolling buffers +
    S chunk + weights fit the (crash-bisected) scratch budget."""
    n_weights = len(steps) * 9 * lpad * lanes * dtype_bytes
    for r in range(_R, 3, -4):
        buf_rows = (r + 2 * steps[0]) + sum(
            r + 2 * s for s in list(steps[1:]) + [0])
        scratch = (buf_rows * w2 * lanes + min(_CHUNK, r) * w2 * 9 * lpad
                   ) * dtype_bytes + n_weights
        if scratch <= _VMEM_BUDGET:
            return r
    return 4


def _cascade_kernel(x_ref, *refs, steps, acts, r, w2, lanes, lpad, n,
                    h2_img, bufs_len):
    """One band: shift every rolling buffer up by ``r`` rows, append the
    delivered input rows, then run each layer on its freshly-complete
    window, masked to the image extent.

    refs: per-layer weight refs, per-layer bias refs, the output ref, the
    input rolling buffer, per-layer output rolling buffers, S scratch.
    """
    nl = len(steps)
    w_refs = refs[:nl]
    b_refs = refs[nl : 2 * nl]
    o_ref = refs[2 * nl]
    scratch = refs[2 * nl + 1 :]
    bufs = scratch[: nl + 1]  # [input buf, layer1..layerN bufs]
    s_ref = scratch[nl + 1]

    band = pl.program_id(1)

    @pl.when(band == 0)
    def _init():
        for bf in bufs:
            bf[...] = jnp.zeros_like(bf)

    # Shift every buffer up by r rows (through registers: source and
    # destination ranges overlap when the buffer is longer than 2r).
    for bf, blen in zip(bufs, bufs_len):
        keep = blen - r
        if keep > 0:
            moved = bf[r : r + keep]
            bf[0:keep] = moved
    # Append the band's input rows (canvas is pre-zero-padded, so no mask).
    bufs[0][bufs_len[0] - r : bufs_len[0]] = x_ref[0, 0]

    # Cumulative lag of each layer under the ones above it.
    pre = []
    acc = 0
    for s in steps:
        acc += s
        pre.append(acc)

    for li, (s, act) in enumerate(zip(steps, acts)):
        src = bufs[li]
        dst = bufs[li + 1]
        dlen = bufs_len[li + 1]
        # compute r new rows in chunks of _CHUNK
        for r0 in range(0, r, _CHUNK):
            c = min(_CHUNK, r - r0)
            for t, (by, bx) in enumerate(_TAPS):
                row0 = r0 + s + by * s
                csh = bx * s
                lo, hi = max(0, -csh), w2 - max(0, csh)
                k0 = t * lpad
                if lo:
                    s_ref[0:c, 0:lo, k0 : k0 + lanes] = jnp.zeros(
                        (c, lo, lanes), s_ref.dtype
                    )
                if hi < w2:
                    s_ref[0:c, hi:w2, k0 : k0 + lanes] = jnp.zeros(
                        (c, w2 - hi, lanes), s_ref.dtype
                    )
                s_ref[0:c, lo:hi, k0 : k0 + lanes] = src[
                    row0 : row0 + c, lo + csh : hi + csh, :
                ]
                if lpad > lanes:
                    s_ref[0:c, :, k0 + lanes : k0 + lpad] = jnp.zeros(
                        (c, w2, lpad - lanes), s_ref.dtype
                    )
            out = jnp.dot(
                s_ref[0:c].reshape(c * w2, 9 * lpad),
                w_refs[li][...],
                preferred_element_type=jnp.float32,
            ) + b_refs[li][0].astype(jnp.float32)
            out = _ACTS[act](out).reshape(c, w2, n)
            # mask rows outside the image to zero: the next layer's taps
            # must see conv-SAME zeros, not leaky(bias) garbage from the
            # lag region / padded canvas
            g0 = band * r - pre[li] + r0  # global row of chunk row 0
            gy = g0 + jax.lax.broadcasted_iota(jnp.int32, (c, 1, 1), 0)
            ok = (gy >= 0) & (gy < h2_img)
            out = jnp.where(ok, out, 0.0).astype(dst.dtype)
            dst[dlen - r + r0 : dlen - r + r0 + c] = out

    # Emit the final layer's r new rows (canvas shifted down by the total
    # lag; the caller slices rows [T, T + H2)).
    o_ref[0, 0] = bufs[nl][bufs_len[nl] - r : bufs_len[nl]]


def fcn_cascade_mxu(
    xp: jnp.ndarray,
    packed_ws: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    steps: Sequence[int],
    acts: Sequence[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the whole packed conv stack in one kernel.

    Args:
      xp: (B, H2, W2, lanes) packed activations (bf16/f32).
      packed_ws: per layer, (9 * Lpad, lanes_out) from
        ``pack_dense9_weights`` (all layers same lanes here).
      biases: per layer, (Cout,).
      steps: per layer block shift (1 for dilation 1; d//2 for even d).
    Returns (B, H2, W2, lanes) in xp's dtype.
    """
    b, h2, w2, lanes = xp.shape
    nl = len(packed_ws)
    acts = list(acts) if acts is not None else ["leaky"] * nl
    lpad = _round_up(lanes, 128)
    n = packed_ws[0].shape[1]
    assert all(w.shape == (9 * lpad, n) for w in packed_ws), (
        [w.shape for w in packed_ws], lpad, n)
    assert n == lanes, "cascade assumes constant width (fcn stack)"

    r = _plan_band_rows(w2, lanes, lpad, steps,
                        jnp.dtype(xp.dtype).itemsize)
    lag = sum(steps)
    nb = -(-(h2 + lag) // r)
    hpad = nb * r
    x_full = jnp.pad(xp, ((0, 0), (0, hpad - h2), (0, 0), (0, 0)))

    # rolling-buffer lengths: input buf needs the first layer's halo; each
    # layer's buf needs the NEXT layer's halo (the last buf feeds only the
    # output, halo 0 — keep r rows).
    bufs_len = [r + 2 * steps[0]]
    for s_next in list(steps[1:]) + [0]:
        bufs_len.append(r + 2 * s_next)

    bps = [jnp.tile(jnp.asarray(bb), 4).reshape(1, n) for bb in biases]
    kernel = functools.partial(
        _cascade_kernel,
        steps=tuple(steps), acts=tuple(acts), r=r, w2=w2, lanes=lanes,
        lpad=lpad, n=n, h2_img=h2, bufs_len=tuple(bufs_len),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=(
            [pl.BlockSpec((1, 1, r, w2, lanes),
                          lambda bb, i: (bb, i, 0, 0, 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((9 * lpad, n), lambda bb, i: (0, 0),
                            memory_space=pltpu.VMEM)] * nl
            + [pl.BlockSpec((1, n), lambda bb, i: (0, 0),
                            memory_space=pltpu.VMEM)] * nl
        ),
        out_specs=pl.BlockSpec((1, 1, r, w2, n),
                               lambda bb, i: (bb, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb, r, w2, n), xp.dtype),
        scratch_shapes=(
            [pltpu.VMEM((blen, w2, lanes), xp.dtype) for blen in bufs_len]
            + [pltpu.VMEM((_CHUNK, w2, 9 * lpad), xp.dtype)]
        ),
        interpret=interpret,
    )(
        x_full.reshape(b, nb, r, w2, lanes),
        *[w.astype(xp.dtype) for w in packed_ws],
        *bps,
    )
    out = out.reshape(b, hpad, w2, n)
    return out[:, lag : lag + h2]


def apply_fcn_cascade(
    params,
    x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`models.fcn.apply_fcn` through the fused cascade: im2col stem
    (3-channel; 12-lane slices don't repay a kernel), ONE cascade call for
    layers 2..depth, 1x1 sigmoid head. Cites apply_fcn_pallas's structure
    (models/fcn.py) with the per-layer dense9 calls replaced by the
    line-buffer kernel."""
    from low_light_image_enhancement_tpu.models.fcn import _dilations
    from low_light_image_enhancement_tpu.ops.patch_conv import (
        conv2d_im2col_gemm,
        depth_to_space,
        pack_im2col_weights,
        space_to_depth,
    )

    batched = x.ndim == 4
    if not batched:
        x = x[None]
    depth = sum(1 for k in params if k.startswith("c"))
    dils = _dilations(depth)
    p1 = params["c1"]
    nhwc = jnp.transpose(x, (0, 2, 3, 1)).astype(compute_dtype)
    h = jax.nn.leaky_relu(
        conv2d_im2col_gemm(nhwc, pack_im2col_weights(p1["w"]), p1["b"],
                           compute_dtype, dilation=dils[0]),
        negative_slope=0.2,
    )
    h = space_to_depth(h)
    ws, bs, steps = [], [], []
    for i, dil in enumerate(dils[1:], start=2):
        p = params[f"c{i}"]
        ws.append(pack_dense9_weights(p["w"], dilation=dil))
        bs.append(p["b"])
        steps.append(max(1, dil // 2))
    h = fcn_cascade_mxu(h, ws, bs, steps, interpret=interpret)
    po = params["out"]
    hn = depth_to_space(h)
    out = jax.nn.sigmoid(
        jnp.einsum(
            "bhwc,cn->bhwn", hn, po["w"][0, 0].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + po["b"].astype(jnp.float32)
    ).astype(jnp.float32)
    out = jnp.transpose(out, (0, 3, 1, 2))
    return out if batched else out[0]
