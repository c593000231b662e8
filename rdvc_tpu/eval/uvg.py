"""UVG-style end-to-end metric harness.

Spec: /root/reference/test_uvg.py:131-345 — read N YUV frames, write a temp
YUV, run the full encode -> .rdvc -> decode stack, read decoded frames,
report per-frame PSNR + MS-SSIM, BPP = file_bytes*8/(N*W*H), bitrate kbps.
Also covers the 600-frame jockey.txt variant via num_frames.
"""

from __future__ import annotations

import logging
import os
import tempfile
import time
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.io.yuv import read_yuv420p_frames, write_yuv420p_frames
from rdvc_tpu.ops.metrics import ms_ssim, psnr
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
from rdvc_tpu.pipeline.decode import decode_video
from rdvc_tpu.pipeline.encode import encode_video

log = logging.getLogger(__name__)


def run_uvg_benchmark(
    yuv_path: str,
    width: int,
    height: int,
    num_frames: int = 50,
    fps: float = 30.0,
    config: Optional[CodecConfig] = None,
    runtime: Optional[CodecRuntime] = None,
) -> Dict:
    config = config or CodecConfig()
    config.input_yuv_width = width
    config.input_yuv_height = height
    config.input_yuv_fps = fps

    src_frames = list(
        read_yuv420p_frames(yuv_path, width, height, max_frames=num_frames)
    )
    n = len(src_frames)
    if n == 0:
        raise ValueError(f"no frames read from {yuv_path}")

    with tempfile.TemporaryDirectory() as td:
        tmp_yuv = os.path.join(td, "clip.yuv")
        write_yuv420p_frames(tmp_yuv, src_frames)
        config.input_file_path = tmp_yuv
        config.output_rdvc_file = os.path.join(td, "clip.rdvc")
        config.input_rdvc_file = config.output_rdvc_file
        config.output_video_path_decode = os.path.join(td, "recon.yuv")

        runtime = runtime or CodecRuntime(
            model_cfg=config.model_config(),
            checkpoint_path=(
                config.codec_checkpoint_path
                if os.path.exists(config.codec_checkpoint_path)
                else None
            ),
        )
        t0 = time.time()
        enc = encode_video(config, runtime=runtime, max_frames=n)
        t_enc = time.time() - t0
        file_bytes = enc["file_bytes"]
        t0 = time.time()
        dec = decode_video(config, runtime=runtime, collect_frames=True)
        t_dec = time.time() - t0
        decoded = dec["decoded_frames"]

    psnrs, msssims = [], []
    for src, rec in zip(src_frames, decoded):
        a = jnp.asarray(src[None], jnp.float32) / 255.0
        b = jnp.asarray(rec[None], jnp.float32) / 255.0
        psnrs.append(float(psnr(a, b)[0]))
        if min(height, width) > 160:
            msssims.append(float(ms_ssim(a, b)[0]))
    if not msssims and min(height, width) <= 160:
        # MS-SSIM's 5-scale pyramid needs min(H, W) > 160 (each scale
        # halves the image; the 11-tap SSIM window must still fit at the
        # coarsest scale) — report None rather than a bogus number.
        log.info(
            "MS-SSIM skipped: min(H, W)=%d <= 160 (5-scale pyramid needs "
            "larger frames)", min(height, width),
        )
    bpp = file_bytes * 8.0 / (n * width * height)
    return {
        "num_frames": n,
        "psnr_avg_db": float(np.mean(psnrs)),
        "psnr_per_frame": psnrs,
        "ms_ssim_avg": float(np.mean(msssims)) if msssims else None,
        "bpp": bpp,
        "bitrate_kbps": bpp * width * height * fps / 1000.0,
        "file_size_bytes": file_bytes,
        "encode_s_per_frame": t_enc / n,
        "decode_s_per_frame": t_dec / n,
        "encode_fps": n / t_enc,
        "decode_fps": n / t_dec,
        "compression_ratio_rdvc_over_yuv": file_bytes / (n * width * height * 1.5),
    }


def main(argv=None) -> int:
    """Standalone UVG runner for real .yuv content (reference
    test_uvg.py semantics; jockey.txt's 600-frame variant via --frames).

    python -m rdvc_tpu.eval.uvg --input Beauty_1920x1080_..._.yuv \
        --width 1920 --height 1080 --frames 50 --comp_height 1080 \
        --checkpoint checkpoints/demo_synthetic.ckpt [--raft auto]
    """
    import argparse
    import json

    p = argparse.ArgumentParser(description="UVG-style codec benchmark")
    p.add_argument("--input", required=True, help=".yuv (yuv420p) path")
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--frames", type=int, default=50)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--comp_height", type=int, default=None,
                   help="flow+residual compression height (RD axis)")
    p.add_argument("--iframe_interval", type=int, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--raft", type=str, default=None,
                   choices=["auto", "raft", "jax", "farneback", "zero"])
    p.add_argument("--hyperprior", action="store_true",
                   help="run a hyperprior checkpoint (decode "
                        "self-configures; encode needs the flag)")
    p.add_argument("--hyper_channels", type=int, default=None)
    p.add_argument("--out", type=str, default=None, help="write JSON here")
    args = p.parse_args(argv)

    config = CodecConfig()
    if args.comp_height is not None:
        config.flow_compress_height = args.comp_height
        config.residual_compress_height = args.comp_height
    if args.iframe_interval is not None:
        config.iframe_interval = args.iframe_interval
    if args.checkpoint:
        config.codec_checkpoint_path = args.checkpoint
    if args.raft:
        config.raft_backend = args.raft
    if args.hyperprior:
        config.hyperprior = True
        if args.hyper_channels:
            config.hyper_channels = args.hyper_channels
    result = run_uvg_benchmark(
        args.input, args.width, args.height,
        num_frames=args.frames, fps=args.fps, config=config,
    )
    doc = json.dumps(
        {k: v for k, v in result.items() if k != "psnr_per_frame"}, indent=2
    )
    print(doc)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    import sys

    logging.basicConfig(level=logging.INFO)
    sys.exit(main())
