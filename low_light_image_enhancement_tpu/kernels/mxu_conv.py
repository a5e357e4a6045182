"""MXU-native conv layer kernel: dense 9-tap packed GEMM (VERDICT r2 item 1).

The learned models' 3x3 convs at 24-32 channels underuse the 128x128 MXU
~25x under XLA's per-tap lowering (measured 4-10% of bf16 peak,
scripts/bench_conv.py). This kernel reformulates one conv layer as a single
big-K GEMM on space-to-depth packed activations:

  out[m, :] = S[m, :] @ W',   S = concat_{t in 9 taps} shift_t(X_packed)

- X packed (B, H/2, W/2, 4*Cin): 4*32 = 128 full lanes at the models' width.
- S assembled in VMEM from 9 row/col-shifted FULL-width copies (static
  slices only — Mosaic on this toolchain rejects pltpu.roll on 3-D vectors
  and lowers sub-128-lane moves poorly; every store here is 128-lane
  aligned, with K per tap padded to a 128 multiple).
- W' ((9*Lpad), 4*Cout) carries the packed-phase routing as weight
  STRUCTURE: for each block shift, exactly the (in-phase -> out-phase)
  blocks whose original tap offset lands in the 3x3 window are nonzero.
  The structural zeros inflate dense FLOPs 4x (Cin=32) over the useful
  conv math — and buy a kernel with zero VPU lane shuffling whose single
  K=1152 dot lets the MXU accumulate across K tiles internally (measured
  ~100 TF/s dense vs ~50 for sub-width-assembled forms and ~8-19 total for
  XLA's conv, scripts/probe_mxu_gemm.py --probe 1..6).
- Even dilations (the fcn stack) use the same kernel with block shifts of
  d/2 and phase-PRESERVING weight structure (taps at +-d keep pixel
  parity), so one kernel serves every layer of every model family.

Row halos travel in a small side input (2*step rows per stripe, built by
XLA); column shifts are in-kernel static sublane slices with zeroed edges
(conv SAME semantics). Inference-only: training keeps the XLA conv path
(no custom VJP here — by design, the train step is MXU-efficient already
at batch granularity).

Parity: tests/kernels/test_mxu_conv.py vs models.layers.conv2d (~1e-5 f32).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    "none": lambda x: x,
    "relu": jax.nn.relu,
    "leaky": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}

_TAPS = tuple((by, bx) for by in (-1, 0, 1) for bx in (-1, 0, 1))

# Mosaic scoped-vmem budget for one grid step's working set (16 MB hard).
_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_dense9_weights(
    w: jnp.ndarray,
    groups: Sequence[int] = (),
    dilation: int = 1,
) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (9 * Lpad, 4 * Cout) dense-9-tap packed weights.

    Row layout: tap-major over ``_TAPS`` (block shifts (by, bx)), then the
    packed input lane layout ([group][phase p = py*2+px][ci]), each tap
    padded to ``Lpad`` (lane-aligned 128 multiple). Column layout: output
    phase-major (q = qy*2+qx) * Cout + co.

    dilation 1: cross-phase routing (dy = 2*by + py - qy must be in
    {-1,0,1}). Even dilation d: block shifts scale to d/2 outside (the
    caller passes ``step=d//2`` to the conv) and taps are phase-preserving
    (p == q, tap index = (by+1, bx+1)). Odd dilations > 1 are not used by
    any model family here.
    """
    w = jnp.asarray(w)
    _, _, cin, cout = w.shape
    groups = tuple(groups) or (cin,)
    assert sum(groups) == cin, (groups, cin)
    lanes = 4 * cin
    lpad = _round_up(lanes, 128)
    n = 4 * cout
    if dilation != 1 and dilation % 2:
        raise ValueError(f"dilation must be 1 or even, got {dilation}")

    out = jnp.zeros((9 * lpad, n), w.dtype)
    cum = np.cumsum((0,) + groups)
    for t, (by, bx) in enumerate(_TAPS):
        for g, cg in enumerate(groups):
            base = 4 * cum[g]
            for p in range(4):
                py, px = p // 2, p % 2
                row0 = t * lpad + base + p * cg
                for q in range(4):
                    qy, qx = q // 2, q % 2
                    if dilation == 1:
                        dy, dx = 2 * by + py - qy, 2 * bx + px - qx
                        if dy not in (-1, 0, 1) or dx not in (-1, 0, 1):
                            continue
                        wt = w[dy + 1, dx + 1, cum[g] : cum[g] + cg]
                    else:
                        if p != q:
                            continue
                        wt = w[by + 1, bx + 1, cum[g] : cum[g] + cg]
                    out = out.at[
                        row0 : row0 + cg, q * cout : (q + 1) * cout
                    ].set(wt)
    return out


def _plan_rows(h2: int, w2: int, lpad: int, n: int, step: int) -> int:
    """Largest stripe height R (multiple of 4) whose working set fits."""
    per_row = w2 * 2 * (9 * lpad + lpad + 2 * lpad + 2 * n)  # S + P + io dbuf
    fixed = 2 * (2 * step * w2 * lpad * 2) + 9 * lpad * n * 2
    r = (_VMEM_BUDGET - fixed) // per_row
    r = max(4, (r // 4) * 4)
    return min(r, _round_up(h2, 4), 32)


def _conv_kernel(x_ref, h_ref, w_ref, b_ref, o_ref, p_ref, s_ref, *,
                 r_rows, w2, lanes, lpad, n, step, act):
    s = step
    # P = stripe rows with halo rows above/below (zeros at image edges,
    # supplied by the XLA-built halo input)
    p_ref[0:s] = h_ref[0, 0, 0:s]
    p_ref[s : s + r_rows] = x_ref[0, 0]
    p_ref[s + r_rows : s + r_rows + s] = h_ref[0, 0, s : 2 * s]
    for t, (by, bx) in enumerate(_TAPS):
        r0 = s + by * s
        csh = bx * s
        lo, hi = max(0, -csh), w2 - max(0, csh)
        k0 = t * lpad
        if lo:
            s_ref[:, 0:lo, k0 : k0 + lanes] = jnp.zeros(
                (r_rows, lo, lanes), s_ref.dtype
            )
        if hi < w2:
            s_ref[:, hi:w2, k0 : k0 + lanes] = jnp.zeros(
                (r_rows, w2 - hi, lanes), s_ref.dtype
            )
        s_ref[:, lo:hi, k0 : k0 + lanes] = p_ref[
            r0 : r0 + r_rows, lo + csh : hi + csh, :
        ]
        if lpad > lanes:
            s_ref[:, :, k0 + lanes : k0 + lpad] = jnp.zeros(
                (r_rows, w2, lpad - lanes), s_ref.dtype
            )
    out = jnp.dot(
        s_ref[:].reshape(r_rows * w2, 9 * lpad),
        w_ref[:],
        preferred_element_type=jnp.float32,
    ) + b_ref[0].astype(jnp.float32)
    out = _ACTS[act](out)
    o_ref[0, 0] = out.reshape(r_rows, w2, n).astype(o_ref.dtype)


def _patch_kernel(x_ref, h_ref, w_ref, b_ref, o_ref, p_ref, s_ref, acc_ref,
                  *, r_rows, w2, groups, n, act):
    """Patch-GEMM chunks: for each patch row oy, assemble the (ox, group,
    ci) K-chunk from phase lane-slices of the zero-padded P stripe (the
    sub-width stores ARE the measured cost — ~50 TF/s dense vs dense9's
    ~100 — but the 16/9 FLOP inflation instead of 4x nets the highest
    useful rate of every formulation probed: ~28 TF/s at Cin=32)."""
    cum = [0]
    for c in groups:
        cum.append(cum[-1] + c)
    p_ref[:] = jnp.zeros_like(p_ref)  # zero boundary = conv SAME
    p_ref[0:1, 1 : 1 + w2, :] = h_ref[0, 0, 0:1]
    p_ref[1 : 1 + r_rows, 1 : 1 + w2, :] = x_ref[0, 0]
    p_ref[1 + r_rows :, 1 : 1 + w2, :] = h_ref[0, 0, 1:2]
    for ci, oy in enumerate((-1, 0, 1, 2)):
        by, py = divmod(oy, 2)
        koff = 0
        for ox in (-1, 0, 1, 2):
            bx, px = divmod(ox, 2)
            p = py * 2 + px
            for g, cg in enumerate(groups):
                base = 4 * cum[g]
                s_ref[:, :, koff : koff + cg] = p_ref[
                    1 + by : 1 + by + r_rows,
                    1 + bx : 1 + bx + w2,
                    base + p * cg : base + (p + 1) * cg,
                ]
                koff += cg
        d = jnp.dot(
            s_ref[:].reshape(r_rows * w2, koff),
            w_ref[ci],
            preferred_element_type=jnp.float32,
        )
        if ci == 0:
            acc_ref[:] = d
        else:
            acc_ref[:] += d
    out = _ACTS[act](acc_ref[:] + b_ref[0].astype(jnp.float32))
    o_ref[0, 0] = out.reshape(r_rows, w2, n).astype(o_ref.dtype)


def conv2d_patch_mxu(
    xp: jnp.ndarray,
    wp: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    groups=(),
    act: str = "none",
    interpret: bool = False,
) -> jnp.ndarray:
    """One packed dilation-1 conv layer as 4 accumulated patch-GEMM chunks.

    xp: (B, H2, W2, 4*Cin) packed activations (Cin = sum(groups); a concat
        of packed tensors for skip connections).
    wp: (4, 4*Cin, 4*Cout) from ``ops.patch_conv.pack_patch_weights`` —
        chunk ``i`` multiplies the patch row at offset (-1, 0, 1, 2)[i].
    Returns (B, H2, W2, 4*Cout) in xp's dtype. Requires Cin lane-slices
    Mosaic can move (8-multiples; use the jnp GEMM path for 3/4-channel
    stem layers and <32-lane heads).
    """
    b, h2, w2, lanes = xp.shape
    groups = tuple(groups) or (lanes // 4,)
    assert 4 * sum(groups) == lanes, (groups, lanes)
    n = wp.shape[-1]
    # stripe-height plan: S + P + acc + io double buffers under the budget
    per_row = w2 * (
        lanes * 2        # S chunk (bf16)
        + lanes * 2      # P
        + n * 4          # acc f32
        + 2 * lanes * 2  # in blocks (double-buffered)
        + 2 * n * 2      # out blocks
    )
    r = max(4, ((_VMEM_BUDGET - 4 * lanes * n * 2) // per_row // 4) * 4)
    r = min(r, _round_up(h2, 4), 32)
    ns = -(-h2 // r)
    hpad = ns * r
    xp_full = xp if hpad == h2 else jnp.pad(
        xp, ((0, 0), (0, hpad - h2), (0, 0), (0, 0))
    )
    xz = jnp.pad(xp_full, ((0, 0), (1, 1), (0, 0), (0, 0)))
    halos = jnp.stack(
        [
            jnp.concatenate(
                [xz[:, i * r : i * r + 1],
                 xz[:, 2 + i * r + r - 1 : 2 + i * r + r]],
                axis=1,
            )
            for i in range(ns)
        ],
        axis=1,
    )  # (B, ns, 2, W2, lanes)
    bp = jnp.tile(jnp.asarray(bias), 4).reshape(1, n)
    kernel = functools.partial(
        _patch_kernel, r_rows=r, w2=w2, groups=groups, n=n, act=act,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, 1, r, w2, lanes),
                         lambda bb, i: (bb, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, w2, lanes),
                         lambda bb, i: (bb, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, lanes, n), lambda bb, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, r, w2, n),
                               lambda bb, i: (bb, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ns, r, w2, n), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((r + 2, w2 + 2, lanes), xp.dtype),
            pltpu.VMEM((r, w2, lanes), xp.dtype),
            pltpu.VMEM((r * w2, n), jnp.float32),
        ],
        interpret=interpret,
    )(xp_full.reshape(b, ns, r, w2, lanes), halos, wp.astype(xp.dtype), bp)
    return out.reshape(b, hpad, w2, n)[:, :h2]


def conv2d_dense9_mxu(
    xp: jnp.ndarray,
    wp: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    act: str = "none",
    step: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """One packed conv layer on the MXU.

    xp: (B, H2, W2, lanes) packed activations (bf16/f32), lanes = 4*Cin
        (concat groups included).
    wp: (9 * Lpad, 4 * Cout) from :func:`pack_dense9_weights` (must match
        xp's dtype or be castable).
    bias: (Cout,) — tiled to the 4 output phases here.
    step: block shift per tap (1 for dilation 1; d//2 for even dilation d).
    Returns (B, H2, W2, 4*Cout) in xp's dtype.
    """
    b, h2, w2, lanes = xp.shape
    lpad = _round_up(lanes, 128)
    assert wp.shape[0] == 9 * lpad, (wp.shape, lpad)
    n = wp.shape[1]
    cout = n // 4
    r = _plan_rows(h2, w2, lpad, n, step)
    ns = -(-h2 // r)
    hpad = ns * r
    if hpad != h2:
        xp_full = jnp.pad(xp, ((0, 0), (0, hpad - h2), (0, 0), (0, 0)))
    else:
        xp_full = xp
    # halo rows per stripe: [i*r - step, i*r) and [i*r + r, i*r + r + step)
    # from the zero-extended row range (conv SAME semantics at image edges)
    xz = jnp.pad(xp_full, ((0, 0), (step, step), (0, 0), (0, 0)))
    halos = jnp.stack(
        [
            jnp.concatenate(
                [
                    xz[:, i * r : i * r + step],
                    xz[:, 2 * step + i * r + r - step : 2 * step + i * r + r],
                ],
                axis=1,
            )
            for i in range(ns)
        ],
        axis=1,
    )  # (B, ns, 2*step, W2, lanes)

    bp = jnp.tile(jnp.asarray(bias), 4).reshape(1, n)
    kernel = functools.partial(
        _conv_kernel,
        r_rows=r, w2=w2, lanes=lanes, lpad=lpad, n=n, step=step, act=act,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, 1, r, w2, lanes),
                         lambda bb, i: (bb, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * step, w2, lanes),
                         lambda bb, i: (bb, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * lpad, n), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, r, w2, n),
                               lambda bb, i: (bb, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ns, r, w2, n), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((r + 2 * step, w2, lanes), xp.dtype),
            pltpu.VMEM((r, w2, 9 * lpad), xp.dtype),
        ],
        interpret=interpret,
    )(xp_full.reshape(b, ns, r, w2, lanes), halos, wp.astype(xp.dtype), bp)
    out = out.reshape(b, hpad, w2, n)
    del cout
    return out[:, :h2]
