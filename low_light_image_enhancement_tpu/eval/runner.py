"""LOL eval harness (BASELINE.json config 2) with device-vs-reference parity.

Structure follows SURVEY.md §3.2: the dataset is decoded on host worker
threads through a double-buffered ``PrefetchQueue`` while the device enhances
the previous batch; PSNR/SSIM are computed per batch. A failed batch is
retried once and then skipped with a log line (batch-level failure detection,
SURVEY.md §5) so one bad input can't kill a long eval.

``parity=True`` re-runs the pure-jnp reference path on the same inputs and
reports the max absolute u8 delta plus the PSNR-delta against ground truth
(the <=0.1 dB budget, BASELINE.json:5).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from low_light_image_enhancement_tpu.data.lol import LOLDataset
from low_light_image_enhancement_tpu.eval.metrics import (
    delta_e76_u8,
    psnr_u8,
    ssim_u8,
)
from low_light_image_enhancement_tpu.io.prefetch import PrefetchQueue
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline
from low_light_image_enhancement_tpu.utils.logging import get_logger

_LOG = get_logger("llie.eval")


def _enhance_with_retry(pipeline, lows, retries: int = 1):
    for attempt in range(retries + 1):
        try:
            return pipeline.enhance_batch(lows)
        except (ValueError, TypeError):
            # Deterministic input/shape bugs: retrying is pointless and
            # skipping would mask a real regression — fail loudly.
            raise
        except Exception as e:  # device/runtime error: retry, then skip
            _LOG.warning(
                "enhance batch failed (attempt %d/%d): %s",
                attempt + 1, retries + 1, e,
            )
    return None


def eval_lol(
    pipeline: Optional[EnhancePipeline] = None,
    dataset: Optional[LOLDataset] = None,
    max_images: Optional[int] = None,
    parity: bool = True,
    batch_size: int = 15,
    prefetch_depth: int = 2,
) -> Dict[str, float]:
    pipeline = pipeline or EnhancePipeline()
    dataset = dataset or LOLDataset(split="eval15")
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    # State which set this eval actually ran (VERDICT r3 item 5: every
    # quality number must say whether it is real LOL or the stand-in).
    _LOG.warning(
        "evaluating %d images from %s",
        n,
        "the deterministic SYNTHETIC LOL stand-in (no real LOL data found; "
        "point --data-dir / LLIE_LOL_DIR at a real LOL layout)"
        if dataset.is_synthetic else f"real on-disk LOL data ({dataset.split})",
    )

    def batches():
        for start in range(0, n, batch_size):
            lows, highs = [], []
            for i in range(start, min(start + batch_size, n)):
                lo, hi, _ = dataset[i]
                lows.append(lo)
                highs.append(hi)
            yield np.stack(lows), np.stack(highs)

    psnrs, ssims, ref_psnrs, parity_max = [], [], [], 0
    delta_es = []
    skipped = 0
    ref_pipe = None
    if parity:
        ref_pipe = EnhancePipeline(
            pipeline.config, model_params=pipeline.model_params, force_jnp=True
        )

    for lows, highs in PrefetchQueue(batches(), depth=prefetch_depth,
                                     device_put=False):
        out = _enhance_with_retry(pipeline, lows)
        if out is None:
            skipped += len(lows)
            continue
        psnrs.extend(np.asarray(psnr_u8(out, highs)).tolist())
        ssims.extend(np.asarray(ssim_u8(out, highs)).tolist())
        delta_es.extend(np.asarray(delta_e76_u8(out, highs)).tolist())
        if ref_pipe is not None:
            # Same failure tolerance as the main path: a transient error on
            # the reference run skips parity for this batch, not the eval.
            ref = _enhance_with_retry(ref_pipe, lows)
            if ref is None:
                _LOG.warning("reference path failed; skipping parity batch")
            else:
                ref_psnrs.extend(np.asarray(psnr_u8(ref, highs)).tolist())
                parity_max = max(
                    parity_max,
                    int(np.abs(
                        out.astype(np.int32) - ref.astype(np.int32)
                    ).max()),
                )

    if not psnrs:
        raise RuntimeError(
            f"eval produced no results: all {skipped} images failed "
            "(see llie.eval warnings above)"
        )
    psnrs_a = np.asarray(psnrs)
    report: Dict[str, float] = {
        "n_images": float(len(psnrs)),
        "n_skipped": float(skipped),
        "synthetic_data": float(dataset.is_synthetic),
        "psnr_mean": float(psnrs_a.mean()),
        "psnr_std": float(psnrs_a.std()),
        "ssim_mean": float(np.mean(ssims)),
        "delta_e76_mean": float(np.mean(delta_es)),
    }
    if parity and ref_psnrs:
        ref_mean = float(np.mean(ref_psnrs))
        report["ref_psnr_mean"] = ref_mean
        report["parity_psnr_delta_db"] = abs(report["psnr_mean"] - ref_mean)
        report["parity_max_abs_u8"] = float(parity_max)
        report["parity_within_0p1db"] = float(
            report["parity_psnr_delta_db"] <= 0.1
        )
    return report
