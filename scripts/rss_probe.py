"""Host-RSS growth probe (VERDICT r3 weak #6: ~9 MB/frame growth across
the 600-frame sustained run, 3.4 -> 8.9 GB, unattributed).

Design: a parent process runs N child segments; each child builds ONE
CodecRuntime and encodes the same clip repeatedly (2 GOPs per step),
logging after every step:
  - VmRSS (the symptom),
  - sum of live jax.Array bytes (device-handle retention),
  - tracemalloc current/peak (PYTHON-allocated bytes — attributes
    allocator growth to python objects vs native/relay buffers),
and finally tracemalloc's top allocation sites. Fresh processes per
segment separate per-process retention (allocator, XLA program cache,
relay client buffers) from monotone leaks: if RSS resets at each child
and climbs identically within each, the growth is process-local cache
warm-up, not an unbounded leak.

Run on the real TPU:
  python scripts/rss_probe.py [--segments 2] [--steps 4] [--gop 32]
Writes benchmarks/rss_probe.json.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def live_jax_mb() -> float:
    import jax

    try:
        return sum(
            x.nbytes for x in jax.live_arrays() if hasattr(x, "nbytes")
        ) / 1e6
    except Exception:
        return -1.0


def child(args) -> int:
    import tracemalloc

    tracemalloc.start(10)
    import numpy as np
    import jax

    np.asarray(jax.device_put(np.zeros(8, np.uint8)))  # relay handshake

    from rdvc_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()

    from rdvc_tpu.config import CodecConfig
    from rdvc_tpu.eval.calibration import calibrate_on_clip
    from rdvc_tpu.eval.clips import coherent_clip
    from rdvc_tpu.io.yuv import write_yuv420p_frames
    from rdvc_tpu.models.raft import RaftRunner
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
    from rdvc_tpu.pipeline.encode import encode_video

    H, W = args.height, args.width
    n_step = 2 * args.gop + 1
    with tempfile.TemporaryDirectory() as td:
        yuv = os.path.join(td, "in.yuv")
        write_yuv420p_frames(yuv, coherent_clip(n_step, H, W, seed=0))

        config = CodecConfig()
        config.input_file_path = yuv
        config.output_rdvc_file = os.path.join(td, "out.rdvc")
        config.input_yuv_width = W
        config.input_yuv_height = H
        config.iframe_interval = args.gop
        config.flow_compress_height = H
        config.residual_compress_height = H
        config.raft_backend = "raft"
        config.raft_checkpoint_path = "checkpoints/demo_raft.ckpt"
        config.codec_checkpoint_path = "checkpoints/demo_synthetic.ckpt"

        runtime = CodecRuntime(
            model_cfg=config.model_config(),
            checkpoint_path=config.codec_checkpoint_path
            if os.path.exists(config.codec_checkpoint_path)
            else None,
        )
        runner = RaftRunner(
            iters=config.raft_iters,
            checkpoint_path=config.raft_checkpoint_path,
        )
        runtime.attach_raft(runner.model, runner.variables)
        calibrate_on_clip(
            runtime, runner.variables, coherent_clip(3, H, W, seed=7), config
        )

        steps = []
        for i in range(args.steps):
            enc = encode_video(config, runtime=runtime, max_frames=n_step)
            cur, peak = tracemalloc.get_traced_memory()
            steps.append({
                "step": i,
                "frames": enc["frames"],
                "rss_mb": round(rss_mb(), 1),
                "live_jax_mb": round(live_jax_mb(), 1),
                "py_traced_mb": round(cur / 1e6, 1),
                "py_traced_peak_mb": round(peak / 1e6, 1),
            })
        top = [
            str(s)
            for s in tracemalloc.take_snapshot()
            .statistics("lineno")[:8]
        ]
    print("RSSPROBE " + json.dumps({"steps": steps, "top_python": top}),
          flush=True)
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--segments", type=int, default=2)
    p.add_argument("--steps", type=int, default=4,
                   help="encode passes per child (2 GOPs each)")
    p.add_argument("--gop", type=int, default=32)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--child", action="store_true")
    args = p.parse_args()
    if args.child:
        return child(args)

    segments = []
    for s in range(args.segments):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--steps", str(args.steps), "--gop", str(args.gop),
             "--height", str(args.height), "--width", str(args.width)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = next(
            (l for l in out.stdout.splitlines() if l.startswith("RSSPROBE ")),
            None,
        )
        if line is None:
            segments.append({"error": out.stderr[-2000:]})
        else:
            segments.append(json.loads(line[len("RSSPROBE "):]))
        print(f"segment {s} done", flush=True)

    # Verdict logic: growth WITHIN a child after step 1 (steady state,
    # caches warm) is the leak signal; identical step-1 jumps across
    # children are cache warm-up.
    verdict = {}
    rates = []
    for seg in segments:
        st = seg.get("steps")
        if st and len(st) >= 3:
            frames = sum(x["frames"] for x in st[1:])
            growth = st[-1]["rss_mb"] - st[0]["rss_mb"]
            rates.append(growth / max(frames, 1))
    if rates:
        verdict["steady_state_mb_per_frame"] = [round(r, 3) for r in rates]
    report = {"segments": segments, "verdict": verdict}
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/rss_probe.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(verdict))
    print("wrote benchmarks/rss_probe.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
