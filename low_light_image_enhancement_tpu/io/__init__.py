"""Host-side I/O: image codecs and the host->HBM prefetch queue."""

from low_light_image_enhancement_tpu.io.codec import decode_image, encode_image
from low_light_image_enhancement_tpu.io.prefetch import PrefetchQueue

__all__ = ["decode_image", "encode_image", "PrefetchQueue"]
