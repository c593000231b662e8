"""CLI, surface-compatible with the reference codec_processing.py
(/root/reference/codec_processing.py:1985-2038): --mode encode|decode,
--gpu (device id; -1 = CPU), --raft_backend, --temporal_filter_alpha, plus
optional overrides for paths and common knobs.

Usage:
    python -m rdvc_tpu.cli --mode encode --input input.yuv --output out.rdvc
    python -m rdvc_tpu.cli --mode decode --input out.rdvc --output recon.mp4
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from rdvc_tpu.config import CodecConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="rdvc_tpu video codec")
    p.add_argument(
        "--mode", choices=["encode", "decode", "info"], required=True,
        help="encode/decode run the codec; info inspects a .rdvc "
             "container (metadata + per-frame payload stats, no device)",
    )
    p.add_argument("--gpu", type=int, default=None,
                   help="device id; -1 forces CPU (reference parity flag)")
    p.add_argument("--raft_backend", type=str, default=None,
                   choices=["auto", "raft", "jax", "farneback", "zero"])
    p.add_argument("--raft_resize_height", type=int, default=None)
    p.add_argument("--raft_resize_width", type=int, default=None)
    p.add_argument("--raft_iters", type=int, default=None)
    p.add_argument("--temporal_filter_alpha", type=float, default=None)
    p.add_argument("--input", type=str, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--iframe_interval", type=int, default=None)
    p.add_argument("--iframe_jpeg_quality", type=int, default=None)
    p.add_argument("--flow_compress_height", type=int, default=None)
    p.add_argument("--residual_compress_height", type=int, default=None)
    p.add_argument("--yuv_width", type=int, default=None)
    p.add_argument("--yuv_height", type=int, default=None)
    p.add_argument("--yuv_fps", type=float, default=None)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--low_motion_replacement_threshold", type=float, default=None)
    p.add_argument("--hyperprior", action="store_true",
                   help="mean-scale hyperprior entropy model (must match "
                        "the checkpoint; decode self-configures from the "
                        "container metadata)")
    p.add_argument("--hyper_channels", type=int, default=None)
    p.add_argument("--json", action="store_true", help="print summary as JSON")
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the run into this "
                        "directory (view with tensorboard/xprof)")
    return p


def config_from_args(args) -> CodecConfig:
    config = CodecConfig()
    config.update_from_args(args)
    if args.checkpoint:
        config.codec_checkpoint_path = args.checkpoint
    if args.mode == "encode":
        if args.input:
            config.input_file_path = args.input
        if args.output:
            config.output_rdvc_file = args.output
    else:
        if args.input:
            config.input_rdvc_file = args.input
        if args.output:
            config.output_video_path_decode = args.output
    for name in (
        "iframe_interval",
        "iframe_jpeg_quality",
        "flow_compress_height",
        "residual_compress_height",
        "low_motion_replacement_threshold",
        "raft_resize_height",
        "raft_resize_width",
        "raft_iters",
    ):
        v = getattr(args, name)
        if v is not None:
            setattr(config, name, v)
    if args.yuv_width is not None:
        config.input_yuv_width = args.yuv_width
    if args.yuv_height is not None:
        config.input_yuv_height = args.yuv_height
    if args.yuv_fps is not None:
        config.input_yuv_fps = args.yuv_fps
    if getattr(args, "hyperprior", False):
        config.hyperprior = True
    if getattr(args, "hyper_channels", None) is not None:
        config.hyper_channels = args.hyper_channels
    return config


def container_info(path: str) -> dict:
    """Inspect a .rdvc container: metadata + per-frame payload statistics.
    Pure host-side parse (no jax, no model) — cheap enough for scripting.
    The reference has no equivalent; its metadata is only visible by
    running a full decode (codec_processing.py:1696-1711)."""
    from rdvc_tpu.container.rdvc_format import RdvcReader

    stats = {
        "I": {"count": 0, "payload_bytes": 0},
        "P": {"count": 0, "payload_bytes": 0},
    }
    frames = []
    with RdvcReader(path) as reader:
        meta = reader.metadata
        for rec in reader.frames():
            s = stats[rec.frame_type]
            s["count"] += 1
            s["payload_bytes"] += len(rec.payload)
            frames.append((rec.index, rec.frame_type, len(rec.payload)))
    total_payload = sum(s["payload_bytes"] for s in stats.values())
    n = len(frames)
    info = {
        "metadata": meta,
        "frames": n,
        "frame_stats": stats,
        "total_payload_bytes": total_payload,
        "file_bytes": __import__("os").path.getsize(path),
    }
    w, h = (meta.get("original_dimensions_wh") or (0, 0))[:2]
    if w and h and n:
        info["bpp"] = round(info["file_bytes"] * 8 / (n * w * h), 4)
    if n:
        info["mean_payload_bytes"] = {
            t: round(s["payload_bytes"] / s["count"], 1)
            for t, s in stats.items()
            if s["count"]
        }
    return info


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    if args.mode == "info":
        if not args.input:
            print("--mode info requires --input <file.rdvc>", file=sys.stderr)
            return 2
        info = container_info(args.input)
        print(json.dumps(info, indent=None if args.json else 2, default=str))
        return 0
    config = config_from_args(args)
    # Device selection (reference --gpu semantics,
    # codec_processing.py:1189-1204): config.gpu None => CPU.
    from rdvc_tpu.utils.runtime import select_device

    dev = select_device(config.gpu)
    logging.getLogger(__name__).info("using device: %s", dev)
    from rdvc_tpu.utils.timers import maybe_trace

    with maybe_trace(args.trace_dir):
        if args.mode == "encode":
            from rdvc_tpu.pipeline.encode import encode_video

            summary = encode_video(config, max_frames=args.max_frames)
            summary = {k: v for k, v in summary.items() if k != "metadata"}
        else:
            from rdvc_tpu.pipeline.decode import decode_video

            summary = decode_video(config)
            summary = {
                "frames": summary["frames"], "timings": summary["timings"]
            }
    if args.json:
        print(json.dumps(summary, default=str))
    else:
        for k, v in summary.items():
            print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
