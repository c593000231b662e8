"""Generate RD_<tag>.md (RD_TAG, default r05): multi-rate RD measurement in the reference's bpp
regime (VERDICT r2 items #2/#3; r3 item #1 adds the production-arch
hyperprior rate points).

Axes:
  * rate ladder — lambda_bpp fine-tuned checkpoints
    (checkpoints/rate_l*.ckpt from scripts/train_rate_points.py)
  * resolution ladder — the reference's compression-height sweep
    (beauty.txt / vis_bench.py:5-24)

Flow backend: the JAX RAFT with its trained checkpoint; its held-out EPE
is measured and published alongside (eval/epe.py). Farneback appears only
as an explicitly-labeled fallback if the RAFT checkpoint is absent.

Run on the real TPU:  python scripts/make_rd_report.py
Env: RD_FRAMES (default 16), RD_HEIGHTS, RD_CKPTS (comma-sep overrides)
"""

import glob
import json
import logging
import os
import sys
import tempfile
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax

logging.basicConfig(level=logging.INFO)
np.asarray(jax.device_put(np.zeros(8, np.uint8)))  # absorb relay handshake

from rdvc_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.eval.clips import coherent_clip
from rdvc_tpu.eval.rd_sweep import run_rd_sweep
from rdvc_tpu.io.yuv import write_yuv420p_frames
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

FRAMES = int(os.environ.get("RD_FRAMES", "16"))
TAG = os.environ.get("RD_TAG", "r05")
HEIGHTS = [
    int(h)
    for h in os.environ.get("RD_HEIGHTS", "1080,720,480,360,240,140").split(",")
]
RAFT_CKPT = os.environ.get("RD_RAFT", "checkpoints/demo_raft.ckpt")

if "RD_CKPTS" in os.environ:
    ckpts = os.environ["RD_CKPTS"].split(",")
else:
    ckpts = sorted(glob.glob("checkpoints/rate_l*.ckpt"))
    if not ckpts:
        ckpts = ["checkpoints/rd_synthetic.ckpt"]

h, w = 1080, 1920
frames = coherent_clip(FRAMES, h, w, seed=11)  # held-out seed

# Flow backend: the repo's own RAFT (VERDICT r2 item #3). EPE measured on
# held-out synthetic pairs so the flow-quality axis is published, not
# assumed.
flow_backend = "raft"
epe_report = None
if os.path.exists(RAFT_CKPT):
    from rdvc_tpu.eval.epe import (
        evaluate_flow_backend,
        heldout_dataset,
        raft_flow_fn,
    )

    epe_report = evaluate_flow_backend(
        raft_flow_fn(RAFT_CKPT, iters=12), heldout_dataset(size=96, length=16)
    )
    print("RAFT EPE:", json.dumps(epe_report))
else:
    flow_backend = "farneback"
    print(f"WARNING: {RAFT_CKPT} missing; falling back to farneback")

os.makedirs("benchmarks", exist_ok=True)
all_results = {}
t_start = time.time()
with tempfile.TemporaryDirectory() as td:
    yuv = os.path.join(td, "heldout.yuv")
    write_yuv420p_frames(yuv, frames)
    for ckpt in ckpts:
        name = os.path.splitext(os.path.basename(ckpt))[0]
        base = CodecConfig()
        base.codec_checkpoint_path = ckpt
        base.raft_backend = flow_backend
        base.raft_checkpoint_path = RAFT_CKPT if flow_backend == "raft" else None
        # Self-configure the entropy-model variant from the checkpoint
        # metadata so one sweep can mix factorized (rate_l*) and
        # hyperprior (rate_hp_l*) rate points.
        if os.path.exists(ckpt):
            from rdvc_tpu.utils.checkpoint import peek_metadata

            mc = (peek_metadata(ckpt) or {}).get("model_config") or {}
            if "hyperprior" in mc:
                base.hyperprior = bool(mc["hyperprior"])
            if mc.get("hyper_channels"):
                base.hyper_channels = int(mc["hyper_channels"])
        runtime = CodecRuntime(
            model_cfg=base.model_config(),
            checkpoint_path=ckpt if os.path.exists(ckpt) else None,
        )
        res = run_rd_sweep(
            yuv, w, h, num_frames=FRAMES, heights=HEIGHTS,
            base_config=base, runtime=runtime, video_name=name,
        )
        all_results[name] = res
dt = time.time() - t_start

# Merge into an existing report (RD_MERGE=1): lets a later run add new
# rate points (e.g. freshly trained lambda checkpoints via RD_CKPTS)
# without re-sweeping the existing ones. Prefers this round's artifact,
# falling back to the round-3 one for the first merge of the round.
if os.environ.get("RD_MERGE") == "1":
    prev_path = next(
        (p for p in (f"benchmarks/rd_{TAG}.json", "benchmarks/rd_r04.json",
          "benchmarks/rd_r03.json")
         if os.path.exists(p)),
        None,
    )
    if prev_path:
        with open(prev_path) as f:
            prev = json.load(f)
        merged = dict(prev.get("results", {}))
        merged.update(all_results)
        all_results = merged
        dt += prev.get("sweep_minutes", 0.0) * 60

report = {
    "frames": FRAMES,
    "heights": HEIGHTS,
    "flow_backend": flow_backend,
    "raft_checkpoint": RAFT_CKPT if flow_backend == "raft" else None,
    "raft_epe_heldout": epe_report,
    "results": all_results,
    "sweep_minutes": dt / 60,
}
with open(f"benchmarks/rd_{TAG}.json", "w") as f:
    json.dump(report, f, indent=2)

try:
    from rdvc_tpu.utils.vis import plot_rd_curves

    plot_rd_curves(
        {
            name: {
                "bpp": [r["bpp"] for r in res],
                "psnr": [r["psnr_avg_db"] for r in res],
            }
            for name, res in all_results.items()
        },
        f"benchmarks/rd_{TAG}.png",
    )
except Exception as e:  # plot is cosmetic; never lose the measurements
    print("plot failed:", e)

from rdvc_tpu.utils.vis import REFERENCE_RD

lines = [
    f"# RD_{TAG} — multi-rate RD measurement",
    "",
    "Rate control into the reference's operating regime: lambda_bpp",
    "fine-tuned checkpoints (scripts/train_rate_points.py) x the",
    "reference's compression-height ladder. Eval clip: held-out synthetic",
    "1080p coherent-motion (rdvc_tpu/eval/clips.py, seed 11), %d frames," % FRAMES,
    "iframe_interval %d. Synthetic content (no UVG/Vimeo in this" % CodecConfig().iframe_interval,
    "environment) — reference numbers below are orientation, not",
    "head-to-head.",
    "",
]
if flow_backend == "raft" and epe_report:
    lines += [
        "Flow backend: JAX RAFT (`%s`), held-out synthetic EPE " % RAFT_CKPT
        + "**%.3f px** (median %.3f, %d pairs; eval/epe.py)." % (
            epe_report["epe_mean"], epe_report["epe_median"],
            epe_report["items"],
        ),
        "",
    ]
else:
    lines += ["Flow backend: host Farneback (RAFT checkpoint missing).", ""]

def _lam(name):  # rate_l30 -> 30; non-ladder names sort last by name
    try:
        return (0, float(name.split("_l")[-1]))
    except ValueError:
        return (1, 0.0)


for name in sorted(all_results, key=lambda n: (_lam(n), n)):
    res = all_results[name]
    lines += [
        "## %s" % name,
        "",
        "| Comp. height | PSNR (dB) | MS-SSIM | BPP | Bitrate (kbps) | enc fps | dec fps |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in res:
        ms = "%.4f" % r["ms_ssim_avg"] if r["ms_ssim_avg"] else "-"
        assert r["ms_ssim_avg"] is None or r["ms_ssim_avg"] <= 1.0, (
            "invalid MS-SSIM in RD table"
        )
        lines.append(
            "| %dp | %.2f | %s | %.4f | %.1f | %.2f | %.2f |" % (
                r["compress_height"], r["psnr_avg_db"], ms, r["bpp"],
                r["bitrate_kbps"], r["encode_fps"], r["decode_fps"],
            )
        )
    lines.append("")
lines += [
    "Sweep wall time: %.1f min on one TPU v5e chip." % (dt / 60),
    "",
    "## Reference published RD (UVG 50-frame, RTX 3050 Ti; vis_bench.py:5-24)",
    "",
    "| Video | Comp. height | PSNR (dB) | MS-SSIM | BPP |",
    "|---|---|---|---|---|",
]
for vid, rows in REFERENCE_RD.items():
    for hh, psnr_v, ms_v, bpp_v in zip(
        rows["res"], rows["psnr"], rows["msssim"], rows["bpp"]
    ):
        lines.append(
            "| %s | %s | %.2f | %.4f | %.4f |" % (vid, hh, psnr_v, ms_v, bpp_v)
        )
with open(f"RD_{TAG}.md", "w") as f:
    f.write("\n".join(lines) + "\n")
print("wrote RD_%s.md (%.1f min)" % (TAG, dt / 60))
