"""JPEG I-frame encode/decode via PIL (host-side).

Spec: reference I-frame path (/root/reference/codec_processing.py:1404-1418:
PIL Image.save(format=JPEG, quality=iframe_jpeg_quality); decode at
codec_processing.py:926 via load_image_as_tensor on bytes).
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image


def encode_jpeg(rgb: np.ndarray, quality: int = 70) -> bytes:
    """(H, W, 3) uint8 RGB -> JPEG bytes."""
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG (or any PIL-readable) bytes -> (H, W, 3) uint8 RGB."""
    with Image.open(io.BytesIO(data)) as img:
        return np.asarray(img.convert("RGB"))
