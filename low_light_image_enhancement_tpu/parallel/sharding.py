"""Mesh construction and sharded execution wrappers.

TPU-native scaling (SURVEY.md §5): a 2-D ``Mesh`` with a ``data`` axis
(batch parallelism) and a ``spatial`` axis (image rows, for frames too large
or too latency-sensitive for one chip — BASELINE.json config 5). XLA
collectives over ICI do all communication: ``ppermute`` halo exchange for
windowed filters, automatic gradient ``psum`` for sharded training.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.config import canvas_margin
from low_light_image_enhancement_tpu.core import MARGIN, enhance_core_padded
from low_light_image_enhancement_tpu.kernels.fused_enhance import fused_retinex
from low_light_image_enhancement_tpu.kernels.striping import plan_stripes
from low_light_image_enhancement_tpu.parallel.halo import halo_pad_local


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "spatial") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_spatial:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_spatial={n_spatial}"
            )
        n_data = len(devices) // n_spatial
    need = n_data * n_spatial
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(grid, ("data", "spatial"))


def shard_batch_fn(fn: Callable, mesh: Mesh) -> Callable:
    """Data-parallel wrapper: shards arg 0's leading (batch) dim over every
    mesh device and lets XLA propagate shardings through the jitted fn."""
    jitted = jax.jit(fn)
    spec = NamedSharding(mesh, P(("data", "spatial")))

    @functools.wraps(fn)
    def wrapped(batch, *rest):
        batch = jax.device_put(batch, spec)
        return jitted(batch, *rest)

    return wrapped


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def enhance_spatial_sharded(
    x: jnp.ndarray,
    cfg: PipelineConfig,
    mesh: Mesh,
    model_params=None,
    use_pallas: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Spatially-sharded enhance (config 5: per-shard denoise), any method.

    Args:
      x: (B, 3, H, W) planar batch — float32 in [0, 1], or uint8 (for
        retinex this is the fast path: halos exchange u8 rows over ICI at
        1/4 the bytes and each shard runs the fused u8 kernel, requiring
        ``use_pallas=True``; learned methods convert at the boundary).
      mesh: mesh with a "spatial" axis; rows shard across it, batch across
        "data". Output is bit-identical to the single-device path: for
        retinex the halo exchange reproduces the padded-canvas rows, for
        learned methods each shard runs the same ``enhance_learned_block``
        the pipeline runs, with halo = the net's receptive field
        (``blocks.learned_halo``).
      model_params: weights for the learned methods (ignored for retinex).

    Returns (B, 3, H, W) enhanced, same dtype as the input.
    """
    if cfg.method != "retinex":
        if model_params is None:
            raise ValueError(
                f"method={cfg.method!r} needs model_params (e.g. "
                "EnhancePipeline._default_params(cfg, seed) or trained "
                "weights); only 'retinex' runs weight-free"
            )
        return _enhance_learned_sharded(
            x, cfg, mesh, model_params, use_pallas, interpret
        )
    if x.dtype == jnp.uint8 and not use_pallas:
        raise ValueError("uint8 sharded path requires use_pallas=True")
    n_sp = mesh.shape["spatial"]
    b, c, h, w = x.shape
    m = canvas_margin(cfg)
    hl = _round_up(-(-h // n_sp), 8)  # rows per shard
    h_core = n_sp * hl
    wp = _round_up(w + 2 * m, 128)
    xc = jnp.pad(
        x, ((0, 0), (0, 0), (0, h_core - h), (m, wp - w - m)), mode="edge"
    )

    def local_fn(xl):  # (B/nd, 3, hl, wp) per device
        canvas = halo_pad_local(xl, m, "spatial")  # (.., hl + 2m, wp)
        if use_pallas:
            from low_light_image_enhancement_tpu.kernels.fused_enhance import (
                retinex_plan_bytes_per_px,
            )

            plan = plan_stripes(hl, wp - 2 * m, m, cfg.stripe_rows,
                                bytes_per_px=retinex_plan_bytes_per_px(cfg))
            extra = plan.padded_h - (hl + 2 * m)
            if extra:
                canvas = jnp.pad(
                    canvas, ((0, 0), (0, 0), (0, extra), (0, 0)), mode="edge"
                )
            out = fused_retinex(canvas, cfg, plan, interpret=interpret)
            return out[..., :hl, :]
        yp = enhance_core_padded(canvas, cfg)
        return yp[..., m : m + hl, :]

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P("data", None, "spatial", None),
        out_specs=P("data", None, "spatial", None),
        # pallas_call's out_shape carries no varying-mesh-axes annotation;
        # skip the vma check (the specs above fully describe the layout).
        check_vma=False,
    )
    out_core = sharded(xc)
    return out_core[..., :h, m : m + w]


def _enhance_learned_sharded(
    x: jnp.ndarray,
    cfg: PipelineConfig,
    mesh: Mesh,
    model_params,
    use_pallas: bool,
    interpret: bool,
) -> jnp.ndarray:
    """Spatial sharding of the learned methods: per-shard
    ``blocks.enhance_learned_block`` with ppermute halos sized to the net's
    receptive field (curve CNN radius 7; fcn dilation stack radius 64 —
    VERDICT r1 item 2). Bit-parity with the single-device pipeline holds by
    construction: both run the identical block function, and
    ``halo_pad_local`` reproduces exactly the rows the pipeline's edge
    padding produces."""
    from low_light_image_enhancement_tpu.blocks import (
        block_geometry,
        enhance_learned_block,
        learned_halo,
    )

    # u8 input flows through as u8: halos exchange u8 rows over ICI (1/4 the
    # bytes) and the block converts at its own boundary (in-kernel on the
    # fused curve/hybrid tail).
    n_sp = mesh.shape["spatial"]
    b, c, h, w = x.shape
    m = canvas_margin(cfg)
    halo = learned_halo(cfg)
    hl, wp = block_geometry(cfg, h, w, n_shards=n_sp)
    h_core = n_sp * hl
    xc = jnp.pad(
        x, ((0, 0), (0, 0), (0, h_core - h), (m, wp - w - m)), mode="edge"
    )

    def local_fn(xl, params):  # (B/nd, 3, hl, wp) per device
        xb = halo_pad_local(xl, halo, "spatial")
        row0 = jax.lax.axis_index("spatial") * hl - halo
        return enhance_learned_block(
            xb, cfg, params, row0, h, w,
            use_pallas=use_pallas, interpret=interpret,
        )

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("data", None, "spatial", None), P()),
        out_specs=P("data", None, "spatial", None),
        check_vma=False,
    )
    return sharded(xc, model_params)[..., :h, m : m + w]
