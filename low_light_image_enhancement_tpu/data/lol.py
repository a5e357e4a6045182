"""LOL paired low-light dataset (485 train / 15 eval pairs).

Loads the standard on-disk layout when available::

    <root>/our485/low/*.png   <root>/our485/high/*.png
    <root>/eval15/low/*.png   <root>/eval15/high/*.png

Root resolution order: explicit ``root`` arg, ``$LLIE_LOL_DIR``, ``data/LOL``
under the repo. When no real dataset is present (this environment has no
network egress), a deterministic synthetic stand-in with the same shapes and
counts is generated so every downstream consumer (eval runner, bench,
training) works unchanged.

Spec: BASELINE.json metric ("images/sec/chip at 600x400 (LOL)") and
configs 1-2 (BASELINE.json:7-8).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from low_light_image_enhancement_tpu.data.synth import synth_pair

_SPLITS = {"train": ("our485", 485), "eval15": ("eval15", 15)}


class LOLDataset:
    def __init__(
        self,
        root: Optional[str] = None,
        split: str = "eval15",
        size: Tuple[int, int] = (400, 600),
        synthetic_seed: int = 0,
    ):
        if split not in _SPLITS:
            raise ValueError(f"split must be one of {sorted(_SPLITS)}")
        self.split = split
        self.size = size
        self._seed = synthetic_seed
        self._files: Optional[List[Tuple[Path, Path]]] = None

        root = root or os.environ.get("LLIE_LOL_DIR") or "data/LOL"
        subdir, self._n_synth = _SPLITS[split]
        low_dir = Path(root) / subdir / "low"
        high_dir = Path(root) / subdir / "high"
        if low_dir.is_dir() and high_dir.is_dir():
            lows = sorted(low_dir.iterdir())
            pairs = []
            for lp in lows:
                hp = high_dir / lp.name
                if hp.exists():
                    pairs.append((lp, hp))
            if pairs:
                self._files = pairs

    @property
    def is_synthetic(self) -> bool:
        return self._files is None

    def __len__(self) -> int:
        return len(self._files) if self._files else self._n_synth

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray, str]:
        """Returns (low_u8, high_u8, name)."""
        if self._files is not None:
            from low_light_image_enhancement_tpu.io.codec import decode_image

            lp, hp = self._files[i]
            return decode_image(lp), decode_image(hp), lp.name
        h, w = self.size
        low, high = synth_pair(i, h, w, seed=self._seed)
        return low, high, f"synth_{self.split}_{i:04d}"

    def low(self, i: int) -> np.ndarray:
        """Low image only — skips the high-image decode (the unpaired
        zero-reference stream reads twice the bytes otherwise)."""
        if self._files is not None:
            from low_light_image_enhancement_tpu.io.codec import decode_image

            return decode_image(self._files[i][0])
        h, w = self.size
        return synth_pair(i, h, w, seed=self._seed)[0]

    def pairs(self) -> Iterator[Tuple[np.ndarray, np.ndarray, str]]:
        for i in range(len(self)):
            yield self[i]

    def train_batch_plans(
        self,
        batch_size: int,
        crop: int,
        seed: int = 0,
        start_step: int = 0,
        augment: bool = True,
        paired: bool = True,
    ) -> Iterator[dict]:
        """Infinite iterator of pure-numpy batch PLANS (no decode): sample
        indices, crop anchors as [0,1) fractions (mapped to offsets at
        decode time, so the plan is image-dimension independent), flip
        bits. Per-step seeded (``(seed, step)``) so a resumed run at
        ``start_step`` sees the exact stream a straight-through run would —
        same contract as train._synth_planar_pairs. Plans are cheap;
        the decode cost lives in :meth:`materialize_batch`, which a
        PrefetchQueue worker pool can parallelize."""
        step = start_step
        n = len(self)
        while True:
            r = np.random.default_rng((seed, step))
            yield {
                "idx": r.integers(0, n, batch_size),
                "uv": r.random((batch_size, 2)),
                "flips": (r.integers(0, 2, (batch_size, 2)) if augment
                          else np.zeros((batch_size, 2), np.int64)),
                "crop": crop,
                "paired": paired,
            }
            step += 1

    def materialize_batch(self, plan: dict):
        """Decode + crop + flip + stack one plan into planar f32:
        ``(low, high)`` ``(B, 3, crop, crop)`` pairs, or just ``low``
        when the plan is unpaired (zero-reference objective)."""
        crop = plan["crop"]
        paired = plan["paired"]
        lows, highs = [], []
        for i, (u, v), (fh, fv) in zip(plan["idx"], plan["uv"],
                                       plan["flips"]):
            if paired:
                lo, hi, _ = self[int(i)]
            else:  # unpaired (zeroref): don't decode the high image at all
                lo, hi = self.low(int(i)), None
            h, w = lo.shape[:2]
            if h < crop or w < crop:
                raise ValueError(
                    f"crop {crop} exceeds image {h}x{w} in {self.split}"
                )
            y = int(u * (h - crop + 1))
            x = int(v * (w - crop + 1))
            lo = lo[y:y + crop, x:x + crop]
            if fh:
                lo = lo[:, ::-1]
            if fv:
                lo = lo[::-1]
            lows.append(lo)
            if paired:
                hi = hi[y:y + crop, x:x + crop]
                if fh:
                    hi = hi[:, ::-1]
                if fv:
                    hi = hi[::-1]
                highs.append(hi)

        def _planar(imgs):
            x8 = np.ascontiguousarray(np.stack(imgs))
            return np.transpose(x8.astype(np.float32) / 255.0, (0, 3, 1, 2))

        if paired:
            return _planar(lows), _planar(highs)
        return _planar(lows)

    def train_batches(
        self,
        batch_size: int,
        crop: int,
        seed: int = 0,
        start_step: int = 0,
        augment: bool = True,
        paired: bool = True,
    ) -> Iterator:
        """Infinite iterator of training batches — the serial composition
        of :meth:`train_batch_plans` and :meth:`materialize_batch` (a
        worker pool composes the same two pieces through PrefetchQueue and
        yields the identical stream)."""
        return map(
            self.materialize_batch,
            self.train_batch_plans(batch_size, crop, seed, start_step,
                                   augment, paired),
        )

    def as_batch(self, n: Optional[int] = None):
        """Stack the first ``n`` (default: all) pairs into (lows, highs)
        uint8 arrays — requires uniform image sizes (true for LOL/synth)."""
        n = len(self) if n is None else min(n, len(self))
        lows, highs = [], []
        for i in range(n):
            lo, hi, _ = self[i]
            lows.append(lo)
            highs.append(hi)
        return np.stack(lows), np.stack(highs)
