"""JPEG/PNG codec (host side).

PIL-backed (PIL links libjpeg-turbo in this environment). Spec:
BASELINE.json north_star ("host-side JPEG/PNG decode").
"""

from __future__ import annotations

import io as _io
import os
from typing import Optional, Union

import numpy as np

from PIL import Image

Source = Union[str, os.PathLike, bytes, bytearray, _io.BytesIO]


def decode_image(src: Source) -> np.ndarray:
    """Decode JPEG/PNG (path or bytes) -> uint8 (H, W, 3) RGB."""
    if isinstance(src, (bytes, bytearray)):
        src = _io.BytesIO(src)
    with Image.open(src) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def encode_image(
    img_u8: np.ndarray,
    dst: Optional[Union[str, os.PathLike]] = None,
    format: Optional[str] = None,
    quality: int = 95,
) -> Optional[bytes]:
    """Encode uint8 (H, W, 3) RGB. With ``dst`` writes a file (format from the
    extension); without, returns encoded bytes (``format`` required)."""
    img_u8 = np.asarray(img_u8)
    if img_u8.dtype != np.uint8:
        raise ValueError(f"expected uint8, got {img_u8.dtype}")
    im = Image.fromarray(img_u8, mode="RGB")
    if dst is not None:
        im.save(dst, format=format, quality=quality)
        return None
    if format is None:
        raise ValueError("format required when encoding to bytes")
    buf = _io.BytesIO()
    im.save(buf, format=format, quality=quality)
    return buf.getvalue()
