"""Video encoder pipeline: frames -> .rdvc.

Mirrors encode_video_main (/root/reference/codec_processing.py:1168-1580):
I-frame every `iframe_interval` frames (JPEG), P-frames via RAFT flow at a
fixed working resolution, warp+MCN prediction at original resolution,
flow/residual resized to aspect-preserving even-rounded compression
resolutions, dual rANS bitstreams, one-pass `.rdvc` container write.

TPU-first differences: all per-frame device work is jitted once per shape;
frame tensors stay on device between stages; the host only runs JPEG, rANS,
and file IO.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.container import RdvcWriter
from rdvc_tpu.io.jpeg import encode_jpeg
from rdvc_tpu.io.video import get_frame_source
from rdvc_tpu.ops.resize import resize_bilinear, resize_flow
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
from rdvc_tpu.pipeline.flow import make_flow_backend
from rdvc_tpu.utils.timers import StageTimer

log = logging.getLogger(__name__)


def compression_resolution(
    height_target: int, frame_width: int, frame_height: int
) -> tuple:
    """Aspect-preserving, even-rounded (H, W)
    (reference codec_processing.py:1348-1367)."""
    aspect = frame_width / frame_height if frame_height > 0 else 1.0
    h = int(height_target)
    w = int(round(h * aspect))
    if w % 2:
        w += 1
    if h % 2:
        h += 1
    return h, w


def encode_video(
    config: CodecConfig,
    runtime: Optional[CodecRuntime] = None,
    max_frames: Optional[int] = None,
    timer: Optional[StageTimer] = None,
) -> Dict:
    """Encode config.input_file_path -> config.output_rdvc_file.

    Returns summary stats (frame counts, byte counts, metadata dict).
    """
    timer = timer or StageTimer()
    runtime = runtime or CodecRuntime(
        model_cfg=config.model_config(),
        checkpoint_path=(
            config.codec_checkpoint_path
            if os.path.exists(config.codec_checkpoint_path)
            else None
        ),
    )

    frames, width, height, fps, total = get_frame_source(
        config.input_file_path,
        config.input_yuv_width,
        config.input_yuv_height,
        config.input_yuv_fps,
        max_frames=max_frames,
    )
    flow_hw = compression_resolution(config.flow_compress_height, width, height)
    res_hw = compression_resolution(
        config.residual_compress_height, width, height
    )
    raft_hw = (config.raft_resize_height, config.raft_resize_width)
    flow_fn = make_flow_backend(
        config.raft_backend,
        raft_iters=config.raft_iters,
        raft_checkpoint_path=config.raft_checkpoint_path,
    )

    writer = RdvcWriter(config.output_rdvc_file)
    prev_rgb: Optional[np.ndarray] = None
    prev_dev = None  # (1, H, W, 3) device tensor of previous frame
    idx = 0
    for rgb in frames:
        is_iframe = (idx % config.iframe_interval == 0) or prev_rgb is None
        if is_iframe:
            with timer.span("iframe_jpeg"):
                writer.add_iframe(
                    idx, encode_jpeg(rgb, config.iframe_jpeg_quality)
                )
            prev_rgb = rgb
            prev_dev = jnp.asarray(
                rgb[None].astype(np.float32) / 255.0
            )
        else:
            try:
                cur_dev = jnp.asarray(rgb[None].astype(np.float32) / 255.0)
                with timer.span("flow_estimation"):
                    f1 = _resize_host(prev_rgb, raft_hw)
                    f2 = _resize_host(rgb, raft_hw)
                    flow_raft = flow_fn(f1, f2)  # (1, rh, rw, 2)
                with timer.span("flow_upscale"):
                    flow_orig = resize_flow(jnp.asarray(flow_raft), (height, width))
                with timer.span("pframe_device"):
                    m_lat, r_lat = runtime.encode_pframe_latents(
                        prev_dev, cur_dev, flow_orig, flow_hw, res_hw
                    )
                with timer.span("rans_encode"):
                    m_bs, m_shape = runtime.compress_motion(m_lat)
                    r_bs, r_shape = runtime.compress_residual(r_lat)
                writer.add_pframe(idx, m_shape, m_bs, r_shape, r_bs)
                # Reference uses the ground-truth current frame as the next
                # reference at encode time (codec_processing.py:1499).
                prev_rgb = rgb
                prev_dev = cur_dev
            except Exception:
                log.exception("P-frame %d failed; forcing next I-frame", idx)
                prev_rgb = None
                prev_dev = None
        idx += 1

    metadata = {
        "rdvc_version": "1.0",
        "input_video_filename": Path(config.input_file_path).name,
        "output_rdvc_filename": Path(config.output_rdvc_file).name,
        "original_dimensions_wh": [width, height],
        "flow_compression_resolution_wh": [flow_hw[1], flow_hw[0]],
        "residual_compression_resolution_wh": [res_hw[1], res_hw[0]],
        "original_fps": fps,
        "total_frames_processed": idx,
        "codec_checkpoint_filename": Path(config.codec_checkpoint_path).name,
        "raft_source_used": config.raft_backend,
        "iframe_interval": config.iframe_interval,
        "iframe_format": "JPEG",
        "iframe_jpeg_quality": config.iframe_jpeg_quality,
        "total_pframe_payload_bytes": writer.total_pframe_payload_bytes,
        "encoder_config_summary": {
            "input_file_path": str(config.input_file_path),
            "flow_compress_height": config.flow_compress_height,
            "residual_compress_height": config.residual_compress_height,
            "iframe_interval": config.iframe_interval,
            "iframe_jpeg_quality": config.iframe_jpeg_quality,
            "raft_backend_requested": config.raft_backend,
        },
    }
    if Path(config.input_file_path).suffix.lower() == ".yuv":
        metadata["encoder_config_summary"].update(
            {
                "input_yuv_width": config.input_yuv_width,
                "input_yuv_height": config.input_yuv_height,
                "input_yuv_pixel_format": config.input_yuv_pixel_format,
                "input_yuv_fps": config.input_yuv_fps,
            }
        )
    with timer.span("container_write"):
        writer.finalize(metadata)
    return {
        "frames": idx,
        "file_bytes": os.path.getsize(config.output_rdvc_file),
        "pframe_payload_bytes": writer.total_pframe_payload_bytes,
        "metadata": metadata,
        "timings": timer.summary(),
    }


def _resize_host(rgb_uint8: np.ndarray, target_hw) -> np.ndarray:
    """Host-side resize of a uint8 RGB frame to the RAFT working resolution,
    returned as float [0,1]."""
    x = jnp.asarray(rgb_uint8[None].astype(np.float32) / 255.0)
    return np.asarray(resize_bilinear(x, target_hw))[0]
