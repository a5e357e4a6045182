"""Datasets: the LOL paired benchmark and a deterministic synthetic fallback."""

from low_light_image_enhancement_tpu.data.lol import LOLDataset
from low_light_image_enhancement_tpu.data.synth import synth_pair, synth_batch

__all__ = ["LOLDataset", "synth_pair", "synth_batch"]
