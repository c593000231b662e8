"""Raw YUV420p (I420) reader/writer and colorspace conversion.

Spec: the reference's YUV reader (/root/reference/codec_processing.py:
1032-1082) reads W*H*3/2 bytes per frame, reshapes to (3H/2, W), and converts
with cv2.COLOR_YUV2BGR_I420 (BT.601 studio-swing). We use cv2 for the exact
same conversion when present and a numpy BT.601 implementation otherwise.
Even-dimension validation and the partial-final-frame warning are preserved.
"""

from __future__ import annotations

import logging
import os
from typing import Iterator, Optional

import numpy as np

try:
    import cv2  # type: ignore

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

log = logging.getLogger(__name__)


def _frame_size_bytes(width: int, height: int) -> int:
    return width * height * 3 // 2


def count_yuv420p_frames(path: str, width: int, height: int) -> int:
    return os.path.getsize(path) // _frame_size_bytes(width, height)


def yuv420p_to_rgb(frame_i420: np.ndarray, width: int, height: int) -> np.ndarray:
    """(3H/2, W) uint8 I420 planes -> (H, W, 3) uint8 RGB (BT.601)."""
    if _HAS_CV2:
        bgr = cv2.cvtColor(frame_i420, cv2.COLOR_YUV2BGR_I420)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    y = frame_i420[:height].astype(np.float32)
    u_plane = frame_i420[height : height + height // 4].reshape(
        height // 2, width // 2
    )
    v_plane = frame_i420[height + height // 4 :].reshape(height // 2, width // 2)
    u = np.repeat(np.repeat(u_plane, 2, 0), 2, 1).astype(np.float32) - 128.0
    v = np.repeat(np.repeat(v_plane, 2, 0), 2, 1).astype(np.float32) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def rgb_to_yuv420p(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (3H/2, W) uint8 I420 planes (BT.601)."""
    h, w = rgb.shape[:2]
    if _HAS_CV2:
        bgr = cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
    f = rgb.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    u_sub = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    v_sub = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    out = np.empty((h * 3 // 2, w), np.uint8)
    out[:h] = np.clip(y, 0, 255).astype(np.uint8)
    out[h : h + h // 4] = np.clip(u_sub, 0, 255).astype(np.uint8).reshape(h // 4, w)
    out[h + h // 4 :] = np.clip(v_sub, 0, 255).astype(np.uint8).reshape(h // 4, w)
    return out


def read_yuv420p_frames(
    path: str,
    width: int,
    height: int,
    max_frames: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield (H, W, 3) uint8 RGB frames from a raw yuv420p file."""
    if width % 2 or height % 2:
        raise ValueError(
            f"YUV420p requires even dimensions, got {width}x{height}"
        )
    fsize = _frame_size_bytes(width, height)
    n = 0
    with open(path, "rb") as f:
        while max_frames is None or n < max_frames:
            data = f.read(fsize)
            if len(data) < fsize:
                if data:
                    log.warning(
                        "partial final frame (%d of %d bytes) ignored",
                        len(data),
                        fsize,
                    )
                return
            i420 = np.frombuffer(data, np.uint8).reshape(height * 3 // 2, width)
            yield yuv420p_to_rgb(i420, width, height)
            n += 1


def read_yuv420p_raw(
    path: str,
    width: int,
    height: int,
    max_frames: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield raw (H*3/2, W) uint8 I420 planes from a raw yuv420p file —
    the upload-lean source for the device encode path (1.5 B/px instead of
    the 3 B/px RGB conversion)."""
    if width % 2 or height % 2:
        raise ValueError(
            f"YUV420p requires even dimensions, got {width}x{height}"
        )
    fsize = _frame_size_bytes(width, height)
    n = 0
    with open(path, "rb") as f:
        while max_frames is None or n < max_frames:
            data = f.read(fsize)
            if len(data) < fsize:
                return
            yield np.frombuffer(data, np.uint8).reshape(
                height * 3 // 2, width
            ).copy()
            n += 1


def write_yuv420p_frames(path: str, frames) -> int:
    """Write an iterable of (H, W, 3) uint8 RGB frames as raw yuv420p."""
    n = 0
    with open(path, "wb") as f:
        for rgb in frames:
            f.write(rgb_to_yuv420p(rgb).tobytes())
            n += 1
    return n
