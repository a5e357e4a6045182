"""Double-buffered host->HBM prefetch queue.

A background worker thread pulls host batches from an iterator, optionally
transforms them, and `jax.device_put`s them so the copy overlaps with device
compute on the previous batch. The bounded queue depth (default 2 = double
buffering) bounds HBM held by in-flight batches.

Spec: BASELINE.json north_star ("double-buffered host->HBM prefetch queue")
and config 4 (1080p streaming, BASELINE.json:10).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax

_SENTINEL = object()


def to_planar(imgs):
    """Host-side HWC -> planar u8 ((..., H, W, 3) -> (..., 3, H, W), C
    contiguous). Run this in a prefetch worker (``transform=``) so the
    device program skips its HWC->planar transpose pass — the largest
    single stage of the default 600x400 program (docs/PERFORMANCE.md
    per-stage table; VERDICT r4 item 2) — and the host copy overlaps
    device compute on earlier batches."""
    import numpy as np

    return np.ascontiguousarray(np.moveaxis(np.asarray(imgs), -1, -3))


def from_planar(imgs):
    """Host-side planar -> HWC u8 (inverse of :func:`to_planar`)."""
    import numpy as np

    return np.ascontiguousarray(np.moveaxis(np.asarray(imgs), -3, -1))


class PrefetchQueue:
    """Iterate device-resident batches while the host decodes ahead.

    Example::

        for batch in PrefetchQueue(host_batches, depth=2):
            out = pipeline.enhance_batch_device(batch)
    """

    def __init__(
        self,
        source: Iterable[Any],
        depth: int = 2,
        device: Optional[jax.Device] = None,
        transform: Optional[Callable[[Any], Any]] = None,
        device_put: bool = True,
        workers: int = 1,
    ):
        """``workers > 1`` runs ``transform`` (typically JPEG decode, which
        releases the GIL in PIL/libjpeg-turbo) on a thread pool while a
        single coordinator preserves ordering and issues the host->device
        copies — the host-decode scaling needed to keep a >1000 img/s device
        fed (SURVEY.md §7 hard part (d))."""
        if depth < 1:
            raise ValueError("depth must be >= 1")
        if workers < 1:
            raise ValueError("workers must be >= 1")
        self._source = iter(source)
        self._device = device
        self._transform = transform
        self._device_put = device_put
        self._workers = workers
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _stage(self, item: Any) -> Any:
        if self._device_put:
            # jax.device_put enqueues the host->device copy asynchronously;
            # it proceeds while the consumer computes on earlier batches.
            item = jax.device_put(item, self._device)
        return item

    def _put(self, item: Any) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self) -> None:
        try:
            if self._workers == 1 or self._transform is None:
                for item in self._source:
                    if self._stop.is_set():
                        return
                    if self._transform is not None:
                        item = self._transform(item)
                    if not self._put(self._stage(item)):
                        return
            else:
                import collections
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self._workers) as pool:
                    pending: "collections.deque" = collections.deque()
                    exhausted = False
                    while not self._stop.is_set():
                        while not exhausted and len(pending) < 2 * self._workers:
                            try:
                                raw = next(self._source)
                            except StopIteration:
                                exhausted = True
                                break
                            pending.append(pool.submit(self._transform, raw))
                        if not pending:
                            break
                        item = pending.popleft().result()
                        if not self._put(self._stage(item)):
                            return
        except BaseException as e:  # propagate to the consumer
            self._err = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self) -> Any:
        while True:
            if self._err is not None and self._q.empty():
                err, self._err = self._err, None
                raise err
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            if item is _SENTINEL:
                if self._err is not None:
                    err, self._err = self._err, None
                    raise err
                raise StopIteration
            return item

    def close(self) -> None:
        """Stop the worker and drop queued batches."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
