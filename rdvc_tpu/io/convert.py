"""Media preparation utilities (the reference's raw.py / crop_raw.py /
fps.py equivalents).

Spec: /root/reference/raw.py:4-56 (ffmpeg mp4 -> yuv420p), crop_raw.py:3-31
(trim a raw YUV to N frames), fps.py:3-31 (downsample frame rate by
dropping frames). ffmpeg is used when present; mp4->yuv falls back to cv2.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def video_to_yuv420p(
    input_path: str, output_path: str, max_frames: Optional[int] = None
) -> int:
    """mp4/any container -> raw yuv420p. Returns frame count."""
    if ffmpeg_available():
        cmd = ["ffmpeg", "-y", "-i", input_path]
        if max_frames:
            cmd += ["-frames:v", str(max_frames)]
        cmd += ["-pix_fmt", "yuv420p", "-f", "rawvideo", output_path]
        subprocess.run(cmd, check=True, capture_output=True)
        # Frame count from file size requires dims; use cv2 fallback count.
    from rdvc_tpu.io.video import get_frame_source
    from rdvc_tpu.io.yuv import write_yuv420p_frames

    frames, w, h, fps, total = get_frame_source(input_path, max_frames=max_frames)
    return write_yuv420p_frames(output_path, frames)


def crop_yuv(
    input_path: str, output_path: str, width: int, height: int, num_frames: int
) -> int:
    """Keep the first N frames of a raw YUV420p file (crop_raw.py)."""
    frame_bytes = width * height * 3 // 2
    copied = 0
    with open(input_path, "rb") as fi, open(output_path, "wb") as fo:
        for _ in range(num_frames):
            data = fi.read(frame_bytes)
            if len(data) < frame_bytes:
                break
            fo.write(data)
            copied += 1
    return copied


def downsample_fps_yuv(
    input_path: str,
    output_path: str,
    width: int,
    height: int,
    keep_every: int = 4,
) -> int:
    """Frame-dropping fps downsample, e.g. 120->30 keeps every 4th (fps.py)."""
    frame_bytes = width * height * 3 // 2
    kept = 0
    i = 0
    with open(input_path, "rb") as fi, open(output_path, "wb") as fo:
        while True:
            data = fi.read(frame_bytes)
            if len(data) < frame_bytes:
                break
            if i % keep_every == 0:
                fo.write(data)
                kept += 1
            i += 1
    return kept
