"""Video source dispatch and sink.

Spec: reference `_get_frame_source_details`
(/root/reference/codec_processing.py:1084-1162): `.yuv` inputs go through
the raw YUV420p reader (frame count derived from file size); everything else
through cv2.VideoCapture. The sink mirrors the reference's cv2.VideoWriter
(fourcc mp4v, original fps/dims, codec_processing.py:1734-1739).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    import cv2  # type: ignore

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from rdvc_tpu.io.yuv import count_yuv420p_frames, read_yuv420p_frames


def get_frame_source(
    path: str,
    yuv_width: Optional[int] = None,
    yuv_height: Optional[int] = None,
    yuv_fps: Optional[float] = None,
    max_frames: Optional[int] = None,
) -> Tuple[Iterator[np.ndarray], int, int, float, int]:
    """Return (rgb_frame_iterator, width, height, fps, total_frames)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".yuv":
        if not yuv_width or not yuv_height:
            raise ValueError("YUV input requires input_yuv_width/height")
        total = count_yuv420p_frames(path, yuv_width, yuv_height)
        if max_frames is not None:
            total = min(total, max_frames)
        it = read_yuv420p_frames(path, yuv_width, yuv_height, max_frames)
        return it, yuv_width, yuv_height, float(yuv_fps or 30.0), total
    if not _HAS_CV2:
        raise RuntimeError("cv2 unavailable; only .yuv inputs supported")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if max_frames is not None and total > 0:
        total = min(total, max_frames)

    def gen() -> Iterator[np.ndarray]:
        n = 0
        while max_frames is None or n < max_frames:
            ok, bgr = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            n += 1
        cap.release()

    return gen(), width, height, fps, total


class VideoSink:
    """mp4 writer (cv2 VideoWriter, fourcc mp4v) with raw-YUV fallback."""

    def __init__(self, path: str, width: int, height: int, fps: float):
        self._path = path
        self._wh = (width, height)
        ext = os.path.splitext(path)[1].lower()
        if ext == ".yuv" or not _HAS_CV2:
            self._writer = None
            self._f = open(path if ext == ".yuv" else path + ".yuv", "wb")
        else:
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            self._writer = cv2.VideoWriter(path, fourcc, fps, (width, height))
            self._f = None
        self.frames_written = 0

    def write_rgb(self, rgb: np.ndarray) -> None:
        if self._writer is not None:
            self._writer.write(cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        else:
            from rdvc_tpu.io.yuv import rgb_to_yuv420p

            self._f.write(rgb_to_yuv420p(rgb).tobytes())
        self.frames_written += 1

    @property
    def accepts_i420(self) -> bool:
        """True when raw I420 planes can be written directly (raw-YUV sink),
        letting the decoder download 1.5 B/px frames from the device."""
        return self._f is not None

    def write_i420(self, i420: np.ndarray) -> None:
        """(H*3/2, W) uint8 I420 planes."""
        if self._f is not None:
            self._f.write(np.ascontiguousarray(i420).tobytes())
        else:
            bgr = cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420)
            self._writer.write(bgr)
        self.frames_written += 1

    def close(self) -> None:
        if self._writer is not None:
            self._writer.release()
        if self._f is not None:
            self._f.close()

    def __enter__(self) -> "VideoSink":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
