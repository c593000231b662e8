"""Rate-distortion sweep over compression resolutions.

Reference: the published RD benchmarks sweep flow/residual_compress_height
over {1080, 720, 480, 360, 240, 140} (beauty.txt runs; plotted by
vis_bench.py). This harness reruns the UVG benchmark per resolution and
emits the table + optional RD-curve plot against the reference's numbers.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Sequence

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.eval.uvg import run_uvg_benchmark
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

log = logging.getLogger(__name__)

REFERENCE_HEIGHTS = (1080, 720, 480, 360, 240, 140)


def run_rd_sweep(
    yuv_path: str,
    width: int,
    height: int,
    num_frames: int = 50,
    heights: Sequence[int] = REFERENCE_HEIGHTS,
    base_config: Optional[CodecConfig] = None,
    runtime: Optional[CodecRuntime] = None,
    plot_path: Optional[str] = None,
    video_name: str = "video",
) -> List[Dict]:
    results = []
    for h in heights:
        config = dataclasses.replace(base_config) if base_config else CodecConfig()
        config.flow_compress_height = h
        config.residual_compress_height = h
        r = run_uvg_benchmark(
            yuv_path, width, height, num_frames=num_frames,
            config=config, runtime=runtime,
        )
        r["compress_height"] = h
        log.info(
            "RD point %dp: PSNR %.2f dB, MS-SSIM %s, bpp %.4f",
            h, r["psnr_avg_db"], r["ms_ssim_avg"], r["bpp"],
        )
        results.append(r)
    if plot_path:
        from rdvc_tpu.utils.vis import plot_rd_curves

        plot_rd_curves(
            {
                video_name: {
                    "bpp": [r["bpp"] for r in results],
                    "psnr": [r["psnr_avg_db"] for r in results],
                }
            },
            plot_path,
        )
    return results


def main(argv=None) -> int:
    """CLI: RD sweep over the reference's height ladder.

    With --synthetic, generates a held-out procedural 1080p clip (distinct
    seed from bench.py/training) so the loop runs without external data.
    """
    import argparse
    import json

    p = argparse.ArgumentParser(description="rdvc_tpu RD sweep")
    p.add_argument("--yuv", type=str, default=None)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument(
        "--stress", action="store_true",
        help="with --synthetic: per-frame phase shimmer (no coherent flow) "
        "— an entropy-coder stress clip, NOT a codec benchmark",
    )
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--heights", type=int, nargs="*",
                   default=list(REFERENCE_HEIGHTS))
    p.add_argument("--out", type=str, default=None, help="JSON output path")
    p.add_argument("--plot", type=str, default=None)
    p.add_argument("--name", type=str, default="synthetic")
    p.add_argument("--hyperprior", action="store_true",
                   help="sweep a hyperprior checkpoint (decode "
                        "self-configures; encode needs the flag)")
    p.add_argument("--hyper_channels", type=int, default=None)
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    import tempfile

    from rdvc_tpu.io.yuv import write_yuv420p_frames

    base = CodecConfig()
    if args.checkpoint:
        base.codec_checkpoint_path = args.checkpoint
    if args.hyperprior:
        base.hyperprior = True
        if args.hyper_channels:
            base.hyper_channels = args.hyper_channels
    with tempfile.TemporaryDirectory() as td:
        if args.synthetic:
            import os

            from rdvc_tpu.eval.clips import coherent_clip, shimmer_clip

            h, w = args.height, args.width
            # Held-out seed (distinct from bench.py seed=0 / training data).
            if args.stress:
                frames = shimmer_clip(args.frames, h, w, seed=11)
            else:
                frames = coherent_clip(args.frames, h, w, seed=11)
            yuv = os.path.join(td, "heldout.yuv")
            write_yuv420p_frames(yuv, frames)
        else:
            if not args.yuv:
                raise SystemExit("--yuv or --synthetic required")
            yuv = args.yuv
        results = run_rd_sweep(
            yuv, args.width, args.height, num_frames=args.frames,
            base_config=base, plot_path=args.plot, video_name=args.name,
        )
    slim = [
        {k: r[k] for k in (
            "compress_height", "psnr_avg_db", "ms_ssim_avg", "bpp",
            "bitrate_kbps", "encode_fps", "decode_fps",
        )}
        for r in results
    ]
    print(json.dumps(slim, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
