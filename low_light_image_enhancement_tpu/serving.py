"""Micro-batching enhancement server (production serving surface).

``EnhanceServer`` accepts single-image requests from any number of threads,
coalesces them into device batches (grouped by bucketed shape), runs the
compiled pipeline once per batch, and resolves per-request futures. This is
the serving-side counterpart of the throughput-oriented batch API: callers
get single-image latency ~= batch latency while the chip stays batched.

Design notes:
  * a single dispatcher thread owns the device — no cross-thread jit races;
  * shape bucketing bounds the number of compiled programs;
  * ``max_batch`` bounds HBM per dispatch, ``max_delay_ms`` bounds queueing
    latency when traffic is sparse.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import numpy as np

from low_light_image_enhancement_tpu.config import PipelineConfig
from low_light_image_enhancement_tpu.pipeline import EnhancePipeline


class EnhanceServer:
    def __init__(
        self,
        config: PipelineConfig = PipelineConfig(),
        pipeline: Optional[EnhancePipeline] = None,
        max_batch: int = 32,
        max_delay_ms: float = 5.0,
        bucket: int = 64,
    ):
        self._pipe = pipeline or EnhancePipeline(config, bucket=bucket)
        if self._pipe.bucket is None:
            self._pipe.bucket = bucket
        self._bucket = self._pipe.bucket
        self._max_batch = max_batch
        self._max_delay = max_delay_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # serializes submit-vs-close so a request can't slip into the queue
        # after close() drains it (its Future would never resolve)
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- public #

    def submit(self, img_u8: np.ndarray) -> "Future[np.ndarray]":
        """Queue one (H, W, 3) u8 image; returns a Future of the result."""
        img_u8 = np.asarray(img_u8)
        if img_u8.ndim != 3 or img_u8.shape[-1] != 3:
            raise ValueError(f"expected RGB (H,W,3), got {img_u8.shape}")
        fut: "Future[np.ndarray]" = Future()
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("server closed")
            self._q.put((img_u8, fut))  # unbounded queue: never blocks
        return fut

    def enhance(self, img_u8: np.ndarray) -> np.ndarray:
        """Blocking convenience call."""
        return self.submit(img_u8).result()

    def close(self) -> None:
        with self._submit_lock:
            self._stop.set()
        # Join without a timeout: a first-request XLA compile inside
        # _run_group can exceed any fixed bound, and draining the queue while
        # the dispatcher still runs would double-resolve its futures.
        self._thread.join()
        # fail any stragglers
        try:
            while True:
                _, fut = self._q.get_nowait()
                fut.set_exception(RuntimeError("server closed"))
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---------------------------------------------------------- dispatch #

    def _key(self, img: np.ndarray) -> Tuple[int, int]:
        g = self._bucket
        h, w, _ = img.shape
        return (-(-h // g) * g, -(-w // g) * g)

    def _dispatch(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            groups: Dict[Tuple[int, int], List] = {}
            groups.setdefault(self._key(first[0]), []).append(first)
            deadline = self._max_delay
            t0 = time.monotonic()
            n = 1
            while n < self._max_batch:
                remaining = deadline - (time.monotonic() - t0)
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                groups.setdefault(self._key(item[0]), []).append(item)
                n += 1
            for (hb, wb), items in groups.items():
                self._run_group(hb, wb, items)

    def _run_group(self, hb: int, wb: int, items: List) -> None:
        try:
            padded = np.stack([
                np.pad(
                    img,
                    ((0, hb - img.shape[0]), (0, wb - img.shape[1]), (0, 0)),
                    mode="edge",
                )
                for img, _ in items
            ])
            # bucket-padding already applied; call the exact-shape path
            out = np.asarray(
                self._pipe.enhance_batch_device(padded)
            )
            for (img, fut), res in zip(items, out):
                h, w, _ = img.shape
                if not fut.done():
                    fut.set_result(res[:h, :w])
        except Exception as e:
            for _, fut in items:
                if not fut.done():
                    fut.set_exception(e)
