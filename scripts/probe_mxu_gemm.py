#!/usr/bin/env python
"""The MXU packed-conv probe campaign, one parameterized script.

Design probes for kernels/mxu_conv.py / kernels/fcn_cascade.py (VERDICT r2
item 1 / r3 item 2). Six measured probes, selectable with --probe N (or
`--probe all`); each prints dense TF/s (counting structural zeros) and the
useful-conv-FLOP rate (9*Cin*Cout MACs per original pixel). All shifts are
static slices — pltpu.roll on 3D vectors does not lower in this toolchain.
Numbers these probes produced are recorded in docs/PERFORMANCE.md
(conv-impl section); the decision they fed is `blocks.AUTO_CONV_BANDS`.

  1  patch-GEMM shapes: pure-matmul ceiling / one-shot K=512 slab /
     128-K chunked assembly with f32 accumulation.
  2  slab-assembly strategies: zero+sub-width stores vs jnp.concatenate
     vs 16 direct (M,32)@(32,128) dots, at R in {16, 32}.
  3  zero-assembly "dense 9-dot packed conv": 9 interior reads of one
     zero-padded scratch, W' carries phase routing as weight sparsity.
  4  dependency-breaking: double-buffered slabs, two accumulators.
  5  big-K dense form: one (M, 9L) @ (9L, N) dot per stripe (MXU
     accumulates across K tiles internally), incl. isolated per-stripe
     marginal timing at two grid sizes.
  6  patch-GEMM chunks assembled by in-kernel concatenate reads from the
     zero-padded scratch (no sub-width stores) — chunked and big-K.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W2, CIN, COUT = 304, 32, 32
L = 4 * CIN          # 128 packed lanes
N = 4 * COUT         # 128
SHIFTS = [(by, bx) for by in (-1, 0, 1) for bx in (-1, 0, 1)]
# patch-GEMM entries as (oy, ox, phase-lane offset)
ENTRIES = [
    (oy, ox, ((oy % 2) * 2 + (ox % 2)) * CIN)
    for oy in (-1, 0, 1, 2)
    for ox in (-1, 0, 1, 2)
]
# probe-6 variant: (oy, ox) -> (row shift by, col shift bx, phase p)
ENTRIES_BLK = []
for _oy in (-1, 0, 1, 2):
    _by, _py = divmod(_oy, 2)
    for _ox in (-1, 0, 1, 2):
        _bx, _px = divmod(_ox, 2)
        ENTRIES_BLK.append((_by, _bx, (_py * 2 + _px) * CIN))


def _sync(x):
    _ = float(jnp.asarray(x).reshape(-1)[0])


def _time(f, x, w, n_short=20, n_long=100):
    """Chained steady-state timing: x feeds back, marginal rate between a
    short and a long chain (same methodology as bench.py — dispatch and
    sync latency cancel)."""
    _sync(f(x, w))

    def chain(n):
        y = x
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(y, w)
        _sync(y)
        return time.perf_counter() - t0

    chain(n_short)
    chain(n_long)
    vals = []
    for _ in range(3):
        ts, tl = chain(n_short), chain(n_long)
        vals.append((tl - ts) / (n_long - n_short))
    return float(np.median(vals))


def _bench(name, kernel, R, ns, krows, scratch, useful_px_factor=4,
           tag=""):
    """Shared pallas_call runner: in (ns,R,W2,L) bf16 + (krows,N) weights,
    out (ns,R,W2,N). Returns dt or None; prints dense/useful TF/s."""
    x = jnp.asarray(
        np.random.default_rng(0).random((ns, R, W2, L)) * 0.1, jnp.bfloat16
    )
    w = jnp.asarray(
        np.random.default_rng(1).random((krows, N)) * 0.05, jnp.bfloat16
    )
    fn = pl.pallas_call(
        kernel,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, R, W2, L), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((krows, N), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W2, N), lambda s: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, R, W2, N), jnp.bfloat16),
        scratch_shapes=scratch,
    )
    try:
        dt = _time(jax.jit(fn), x, w)
    except Exception as e:  # noqa: BLE001
        print(f"{name:14s} R={R:3d} {tag}FAILED {type(e).__name__} "
              f"{str(e)[-140:]}", flush=True)
        return None
    px = ns * R * W2
    dense = px * krows * N * 2
    useful = px * useful_px_factor * 9 * CIN * COUT * 2
    print(f"{name:14s} R={R:3d} {tag}{dt*1e6:8.1f} us  "
          f"dense {dense/dt/1e12:6.2f} TF/s  useful {useful/dt/1e12:6.2f}",
          flush=True)
    return dt


def _store_entry(s_ref, x_ref, j, ox, p, R):
    lo, hi = max(0, -ox), W2 - max(0, ox)
    s_ref[:, lo:hi, j * CIN : (j + 1) * CIN] = x_ref[
        0, :, lo + ox : hi + ox, p : p + CIN
    ]


# ---------------------------------------------------------------- probe 1
def probe1():
    """Patch-GEMM shape ceiling: matmul / slab / chunked (R=16).

    `useful` here counts 9*CIN*COUT MACs per PACKED row (phases are faked
    as lane blocks, not spatially unpacked), so it is 1/4 of the other
    probes' convention — comparable within this probe only.
    """
    R = 16
    M = R * W2
    ns = 12

    def k_matmul(x_ref, w_ref, o_ref):
        x = x_ref[0].reshape(M, L)
        o_ref[0] = jnp.dot(
            x, w_ref[:], preferred_element_type=jnp.float32
        ).reshape(R, W2, N).astype(jnp.bfloat16)

    def k_slab(x_ref, w_ref, o_ref, s_ref):
        # 16 shifted lane-block copies (4 oy x 4 ox)
        for i, oy in enumerate((-1, 0, 1, 2)):
            for j, ox in enumerate((-1, 0, 1, 2)):
                p = ((oy % 2) * 2 + (ox % 2)) * CIN
                k0 = (i * 4 + j) * CIN
                lo, hi = max(0, -ox), W2 - max(0, ox)
                s_ref[:, lo:hi, k0 : k0 + CIN] = (
                    x_ref[0, :, lo + ox : hi + ox, p : p + CIN])
        s = s_ref[:].reshape(M, 4 * L)
        o_ref[0] = jnp.dot(
            s, w_ref[:], preferred_element_type=jnp.float32
        ).reshape(R, W2, N).astype(jnp.bfloat16)

    def k_chunked(x_ref, w_ref, o_ref, s_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for c, oy in enumerate((-1, 0, 1, 2)):  # one 128-K chunk per oy
            for j, ox in enumerate((-1, 0, 1, 2)):
                p = ((oy % 2) * 2 + (ox % 2)) * CIN
                lo, hi = max(0, -ox), W2 - max(0, ox)
                s_ref[:, lo:hi, j * CIN : (j + 1) * CIN] = (
                    x_ref[0, :, lo + ox : hi + ox, p : p + CIN])
            acc_ref[:] += jnp.dot(
                s_ref[:].reshape(M, L),
                w_ref[c * L : (c + 1) * L, :],
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = acc_ref[:].reshape(R, W2, N).astype(jnp.bfloat16)

    print(f"stripes={ns} R={R} W2={W2} L={L} N={N}")
    # HBM-bound at K=128; context only
    _bench("matmul", k_matmul, R, ns, L, [], useful_px_factor=1)
    _bench("slab", k_slab, R, ns, 4 * L,
           [pltpu.VMEM((R, W2, 4 * L), jnp.bfloat16)], useful_px_factor=1)
    _bench("chunked", k_chunked, R, ns, 4 * L,
           [pltpu.VMEM((R, W2, L), jnp.bfloat16),
            pltpu.VMEM((R * W2, N), jnp.float32)], useful_px_factor=1)


# ---------------------------------------------------------------- probe 2
def _make_chunk(R):
    M = R * W2

    def k(x_ref, w_ref, o_ref, s_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for c in range(4):
            s_ref[:] = jnp.zeros_like(s_ref)
            for j in range(4):
                oy, ox, p = ENTRIES[c * 4 + j]
                _store_entry(s_ref, x_ref, j, ox, p, R)
            acc_ref[:] += jnp.dot(
                s_ref[:].reshape(M, L),
                w_ref[c * L : (c + 1) * L, :],
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = acc_ref[:].reshape(R, W2, N).astype(jnp.bfloat16)

    return k, [pltpu.VMEM((R, W2, L), jnp.bfloat16),
               pltpu.VMEM((M, N), jnp.float32)]


def probe2():
    """Slab assembly: stores vs concatenate vs direct dots, R in {16,32}."""

    def make_concat(R):
        M = R * W2

        def k(x_ref, w_ref, o_ref):
            parts = []
            for oy, ox, p in ENTRIES:
                lo, hi = max(0, -ox), W2 - max(0, ox)
                blk = x_ref[0, :, :, p : p + CIN]
                # static shift via slice + zero-pad columns
                pads = [(0, 0), (lo, W2 - hi), (0, 0)]
                blk = jnp.pad(blk[:, lo + ox : hi + ox, :], pads)
                parts.append(blk)
            s = jnp.concatenate(parts, axis=-1).reshape(M, 16 * CIN)
            o_ref[0] = jnp.dot(
                s, w_ref[:], preferred_element_type=jnp.float32
            ).reshape(R, W2, N).astype(jnp.bfloat16)

        return k, []

    def make_direct(R):
        M = R * W2

        def k(x_ref, w_ref, o_ref, acc_ref):
            acc_ref[:] = jnp.zeros_like(acc_ref)
            for idx, (oy, ox, p) in enumerate(ENTRIES):
                lo, hi = max(0, -ox), W2 - max(0, ox)
                blk = x_ref[0, :, lo + ox : hi + ox, p : p + CIN]
                pads = [(0, 0), (lo, W2 - hi), (0, 0)]
                blk = jnp.pad(blk, pads)
                acc_ref[:] += jnp.dot(
                    blk.reshape(M, CIN),
                    w_ref[idx * CIN : (idx + 1) * CIN, :],
                    preferred_element_type=jnp.float32,
                )
            o_ref[0] = acc_ref[:].reshape(R, W2, N).astype(jnp.bfloat16)

        return k, [pltpu.VMEM((M, N), jnp.float32)]

    for R in (16, 32):
        ns = 12 * 16 // R
        for name, maker in (("chunk", _make_chunk), ("concat", make_concat),
                            ("direct", make_direct)):
            k, scratch = maker(R)
            _bench(name, k, R, ns, 16 * CIN, scratch)


# ---------------------------------------------------------------- probe 3
def _make_dense9(R, use_acc):
    M = R * W2

    def k(*refs):
        if use_acc:
            x_ref, w_ref, o_ref, p_ref, acc_ref = refs
        else:
            x_ref, w_ref, o_ref, p_ref = refs
        p_ref[:] = jnp.zeros_like(p_ref)
        p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
        terms = []
        for t, (by, bx) in enumerate(SHIFTS):
            blk = p_ref[1 + by : 1 + by + R, 1 + bx : 1 + bx + W2, :]
            d = jnp.dot(
                blk.reshape(M, L),
                w_ref[t * L : (t + 1) * L, :],
                preferred_element_type=jnp.float32,
            )
            if use_acc:
                if t == 0:
                    acc_ref[:] = d
                else:
                    acc_ref[:] += d
            else:
                terms.append(d)
        acc = acc_ref[:] if use_acc else sum(terms)
        o_ref[0] = acc.reshape(R, W2, N).astype(jnp.bfloat16)

    scratch = [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16)]
    if use_acc:
        scratch.append(pltpu.VMEM((M, N), jnp.float32))
    return k, scratch


def probe3():
    """Zero-assembly dense 9-dot packed conv (expression-sum vs f32 acc)."""
    for R in (16, 24):
        ns = 192 // R
        for name, use_acc in (("dense9-expr", False), ("dense9-acc", True)):
            k, scratch = _make_dense9(R, use_acc)
            _bench(name, k, R, ns, 9 * L, scratch)


# ---------------------------------------------------------------- probe 4
def probe4():
    """Dependency-breaking: double buffers / dual accumulators."""

    def make_chunk_dbuf(R, n_acc):
        M = R * W2

        def k(x_ref, w_ref, o_ref, s0, s1, *accs):
            bufs = (s0, s1)
            for a in accs:
                a[:] = jnp.zeros_like(a)
            for c in range(4):
                s = bufs[c % 2]
                s[:] = jnp.zeros_like(s)
                for j in range(4):
                    oy, ox, p = ENTRIES[c * 4 + j]
                    _store_entry(s, x_ref, j, ox, p, R)
                accs[c % n_acc][:] += jnp.dot(
                    s[:].reshape(M, L),
                    w_ref[c * L : (c + 1) * L, :],
                    preferred_element_type=jnp.float32,
                )
            tot = accs[0][:]
            for a in accs[1:]:
                tot = tot + a[:]
            o_ref[0] = tot.reshape(R, W2, N).astype(jnp.bfloat16)

        scratch = [pltpu.VMEM((R, W2, L), jnp.bfloat16)] * 2 + \
            [pltpu.VMEM((M, N), jnp.float32)] * n_acc
        return k, scratch, 16 * CIN

    def make_dense9_acc2(R):
        M = R * W2

        def k(x_ref, w_ref, o_ref, p_ref, a0, a1):
            p_ref[:] = jnp.zeros_like(p_ref)
            p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
            accs = (a0, a1)
            for a in accs:
                a[:] = jnp.zeros_like(a)
            for t, (by, bx) in enumerate(SHIFTS):
                blk = p_ref[1 + by : 1 + by + R, 1 + bx : 1 + bx + W2, :]
                accs[t % 2][:] += jnp.dot(
                    blk.reshape(M, L),
                    w_ref[t * L : (t + 1) * L, :],
                    preferred_element_type=jnp.float32,
                )
            o_ref[0] = (a0[:] + a1[:]).reshape(R, W2, N).astype(jnp.bfloat16)

        scratch = [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16),
                   pltpu.VMEM((M, N), jnp.float32),
                   pltpu.VMEM((M, N), jnp.float32)]
        return k, scratch, 9 * L

    for name, maker, args in (("chunk-dbuf", make_chunk_dbuf, (16, 1)),
                              ("chunk-acc2", make_chunk_dbuf, (16, 2))):
        k, scratch, krows = maker(*args)
        _bench(name, k, args[0], 192 // args[0], krows, scratch)
    k, scratch, krows = make_dense9_acc2(16)
    _bench("dense9-acc2", k, 16, 12, krows, scratch)


# ---------------------------------------------------------------- probe 5
def probe5():
    """Big-K dense form; isolated per-stripe marginal at two grid sizes."""

    def make_bigk(R):
        M = R * W2

        def k(x_ref, w_ref, o_ref, p_ref, s_ref):
            p_ref[:] = jnp.zeros_like(p_ref)
            p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
            for t, (by, bx) in enumerate(SHIFTS):
                s_ref[:, :, t * L : (t + 1) * L] = p_ref[
                    1 + by : 1 + by + R, 1 + bx : 1 + bx + W2, :
                ]
            o_ref[0] = jnp.dot(
                s_ref[:].reshape(M, 9 * L),
                w_ref[:],
                preferred_element_type=jnp.float32,
            ).reshape(R, W2, N).astype(jnp.bfloat16)

        return k, [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16),
                   pltpu.VMEM((R, W2, 9 * L), jnp.bfloat16)]

    R = 8
    k, scratch = make_bigk(R)
    t_small = _bench("bigk", k, R, 24, 9 * L, scratch, tag="ns=  24 ")
    t_big = _bench("bigk", k, R, 96, 9 * L, scratch, tag="ns=  96 ")
    if t_small and t_big:
        per_stripe = (t_big - t_small) / (96 - 24)
        dense = R * W2 * 9 * L * N * 2
        useful = R * W2 * 4 * 9 * CIN * COUT * 2
        print(f"isolated per-stripe: {per_stripe*1e6:.2f} us  "
              f"dense {dense/per_stripe/1e12:.2f} TF/s  "
              f"useful {useful/per_stripe/1e12:.2f} TF/s", flush=True)


# ---------------------------------------------------------------- probe 6
def probe6():
    """Concatenate-read chunk assembly from the zero-padded scratch."""

    def make_concat_chunk(R):
        M = R * W2

        def k(x_ref, w_ref, o_ref, p_ref, acc_ref):
            p_ref[:] = jnp.zeros_like(p_ref)
            p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
            for c in range(4):  # one 128-K chunk per patch row oy
                parts = []
                for j in range(4):
                    by, bx, p = ENTRIES_BLK[c * 4 + j]
                    parts.append(
                        p_ref[1 + by : 1 + by + R, 1 + bx : 1 + bx + W2,
                              p : p + CIN]
                    )
                s = jnp.concatenate(parts, axis=-1).reshape(M, L)
                d = jnp.dot(s, w_ref[c * L : (c + 1) * L, :],
                            preferred_element_type=jnp.float32)
                if c == 0:
                    acc_ref[:] = d
                else:
                    acc_ref[:] += d
            o_ref[0] = acc_ref[:].reshape(R, W2, N).astype(jnp.bfloat16)

        return k, [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16),
                   pltpu.VMEM((M, N), jnp.float32)]

    def make_concat_bigk(R):
        M = R * W2

        def k(x_ref, w_ref, o_ref, p_ref):
            p_ref[:] = jnp.zeros_like(p_ref)
            p_ref[1 : R + 1, 1 : W2 + 1, :] = x_ref[0]
            parts = []
            for by, bx, p in ENTRIES_BLK:
                parts.append(
                    p_ref[1 + by : 1 + by + R, 1 + bx : 1 + bx + W2,
                          p : p + CIN]
                )
            s = jnp.concatenate(parts, axis=-1).reshape(M, 16 * CIN)
            o_ref[0] = jnp.dot(
                s, w_ref[:], preferred_element_type=jnp.float32
            ).reshape(R, W2, N).astype(jnp.bfloat16)

        return k, [pltpu.VMEM((R + 2, W2 + 2, L), jnp.bfloat16)]

    for name, maker, R, ns in (("concat-chunk", make_concat_chunk, 16, 48),
                               ("concat-bigk", make_concat_bigk, 16, 48),
                               ("concat-chunk", make_concat_chunk, 32, 24)):
        k, scratch = maker(R)
        _bench(name, k, R, ns, 16 * CIN, scratch, tag=f"ns={ns:4d} ")


PROBES = {1: probe1, 2: probe2, 3: probe3, 4: probe4, 5: probe5, 6: probe6}


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--probe", default="all",
                    help="probe number 1-6, comma list, or 'all'")
    a = ap.parse_args()
    nums = (sorted(PROBES) if a.probe == "all"
            else [int(s) for s in a.probe.split(",")])
    for n in nums:
        print(f"--- probe {n}: {PROBES[n].__doc__.splitlines()[0]}")
        PROBES[n]()
