"""Video decoder pipeline: .rdvc -> frames.

Mirrors decode_video_main (/root/reference/codec_processing.py:1663-1980):
parse container, JPEG-decode I-frames, reconstruct P-frames against the RAW
previous reconstruction (post-processing never feeds back into the codec
reference — the encoder/decoder state-sync invariant,
codec_processing.py:1941), then apply the post-processing cascade:
low-motion-region replacement -> histogram matching (vs previous
POST-PROCESSED frame) -> first-order IIR temporal filter.

TPU-first: all three post stages run on device (the reference round-trips
hist-match through CPU skimage per frame).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.container import (
    RdvcReader,
    unpack_iframe_payload,
    unpack_pframe_payload,
)
from rdvc_tpu.io.jpeg import decode_jpeg
from rdvc_tpu.io.video import VideoSink
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
from rdvc_tpu.postproc import (
    histogram_match_ycrcb,
    low_motion_replacement,
    temporal_iir_filter,
)
from rdvc_tpu.utils.timers import StageTimer

log = logging.getLogger(__name__)


def decode_video(
    config: CodecConfig,
    runtime: Optional[CodecRuntime] = None,
    sink: Optional[VideoSink] = None,
    collect_frames: bool = False,
    timer: Optional[StageTimer] = None,
) -> Dict:
    """Decode config.input_rdvc_file -> config.output_video_path_decode."""
    timer = timer or StageTimer()
    runtime = runtime or CodecRuntime(
        model_cfg=config.model_config(),
        checkpoint_path=(
            config.codec_checkpoint_path
            if os.path.exists(config.codec_checkpoint_path)
            else None
        ),
    )

    reader = RdvcReader(config.input_rdvc_file)
    meta = reader.metadata
    width, height = meta["original_dimensions_wh"]
    fps = float(meta.get("original_fps", 30.0))

    own_sink = sink is None
    if own_sink:
        sink = VideoSink(config.output_video_path_decode, width, height, fps)

    # Decoder state (reference codec_processing.py:1691-1693, 1940-1943)
    ref_raw = None        # raw reconstruction fed back into the codec
    prev_post = None      # previous post-processed frame (hist-match/IIR ref)
    latest_iframe = None  # latest decoded I-frame (LMR source)
    lmr_threshold = jnp.float32(config.low_motion_replacement_threshold)
    iir_alpha = jnp.float32(config.temporal_filter_alpha)

    frames_out = [] if collect_frames else None
    n_frames = 0
    try:
        for rec in reader.frames():
            if rec.frame_type == "I":
                with timer.span("iframe_decode"):
                    _, img_bytes = unpack_iframe_payload(rec.payload)
                    rgb = decode_jpeg(img_bytes)
                    frame = jnp.asarray(rgb[None].astype(np.float32) / 255.0)
                ref_raw = frame
                latest_iframe = frame
                post = frame
                if prev_post is not None and float(iir_alpha) > 0:
                    post = temporal_iir_filter(post, prev_post, iir_alpha)
            else:
                if ref_raw is None:
                    log.warning("P-frame %d before any I-frame; skipped", rec.index)
                    continue
                with timer.span("payload_unpack"):
                    m_shape, m_bs, r_shape, r_bs = unpack_pframe_payload(rec.payload)
                with timer.span("rans_decode"):
                    q_m = runtime.decompress_motion(m_bs, m_shape)
                    q_r = runtime.decompress_residual(r_bs, r_shape)
                with timer.span("reconstruct_device"):
                    out = runtime.reconstruct_p_frame(
                        ref_raw, q_m, q_r, (height, width)
                    )
                raw = out["reconstructed"]
                post = raw
                # Stage 2: low-motion region replacement (P only)
                if config.low_motion_replacement_threshold > 0 and latest_iframe is not None:
                    with timer.span("post_lmr"):
                        post, _ = low_motion_replacement(
                            post, out["flow"], latest_iframe, lmr_threshold
                        )
                # Stage 3: histogram matching vs previous post-processed (P only)
                if prev_post is not None:
                    with timer.span("post_histmatch"):
                        post = histogram_match_ycrcb(post, prev_post)
                # Stage 4: temporal IIR (all frames; alpha 0 disables)
                if float(iir_alpha) > 0 and prev_post is not None:
                    with timer.span("post_iir"):
                        post = temporal_iir_filter(post, prev_post, iir_alpha)
                ref_raw = raw  # codec reference stays RAW
            prev_post = post
            with timer.span("frame_write"):
                rgb_out = np.asarray(
                    jnp.clip(post[0] * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
                )
            if sink is not None:
                sink.write_rgb(rgb_out)
            if collect_frames:
                frames_out.append(rgb_out)
            n_frames += 1
    finally:
        reader.close()
        if own_sink and sink is not None:
            sink.close()

    return {
        "frames": n_frames,
        "metadata": meta,
        "decoded_frames": frames_out,
        "timings": timer.summary(),
    }
