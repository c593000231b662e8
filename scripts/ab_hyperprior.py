"""A/B: factorized vs mean-scale hyperprior entropy model, matched setup.

Trains both variants from scratch with identical data/seed/steps/lambda
(phase 2), then measures on held-out pairs:
  - real coded payload bytes (through the actual rANS coders: factorized
    tables vs hyper_compress) -> bpp,
  - eval-forward reconstruction PSNR.
The hyperprior's claim is rate at matched distortion; this produces the
evidence artifact (benchmarks/ab_hyperprior_rd.json). CPU-feasible at the
reduced architecture below; on the real TPU run with AB_FULL=1 for the
production architecture.

Usage: python scripts/ab_hyperprior.py [out.json]
Env:   AB_STEPS (default 300), AB_CROP (48), AB_BATCH (2), AB_LAMBDA (10),
       AB_FULL (0 = reduced channels), AB_EVAL_PAIRS (8)
"""

import json
import os
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

if os.environ.get("AB_CPU", "1") == "1" and "pytest" not in sys.modules:
    # Default CPU: this is the CPU-feasibility study; AB_CPU=0 on the TPU.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from rdvc_tpu.config import ModelConfig, TrainConfig
from rdvc_tpu.train.data import (
    CoherentCropDataset,
    MixtureDataset,
    SyntheticFlowPairDataset,
    batch_iterator,
)
from rdvc_tpu.train.loop import Trainer

STEPS = int(os.environ.get("AB_STEPS", "300"))
CROP = int(os.environ.get("AB_CROP", "48"))
BATCH = int(os.environ.get("AB_BATCH", "2"))
LAM = float(os.environ.get("AB_LAMBDA", "10"))
FULL = os.environ.get("AB_FULL", "0") == "1"
EVAL_PAIRS = int(os.environ.get("AB_EVAL_PAIRS", "8"))

OUT = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/ab_hyperprior_rd.json"
os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)

ARCH = (
    {}
    if FULL
    else dict(
        motion_latent_channels=32,
        residual_latent_channels=48,
        encoder_base_channels=16,
        mcn_base_channels=16,
        hyper_channels=32,
    )
)


def make_dataset(seed: int, length: int):
    return MixtureDataset(
        CoherentCropDataset(size=CROP, length=length // 2, seed=seed),
        SyntheticFlowPairDataset(size=CROP, length=length // 2, seed=seed),
    )


def train_variant(hyper: bool):
    cfg = TrainConfig(
        batch_size=BATCH, crop_size=(CROP, CROP), seed=0,
        real_bitstream_check_every=0,
    )
    cfg.lambda_bpp_motion = LAM
    cfg.lambda_bpp_residual = LAM
    mc = ModelConfig(**{**ARCH, "hyperprior": hyper})
    trainer = Trainer(cfg=cfg, model_cfg=mc)
    state = trainer.init_state(spatial=(CROP, CROP))
    ds = make_dataset(seed=0, length=max(4 * BATCH, 16))
    t0 = time.time()
    step = 0
    metrics = {}
    while step < STEPS:
        for batch in batch_iterator(ds, BATCH, shuffle=True, seed=step):
            state, metrics = trainer.train_step(state, batch, phase=2)
            step += 1
            if step >= STEPS:
                break
    train_s = time.time() - t0
    return trainer, state, {
        "steps": STEPS,
        "train_s": round(train_s, 1),
        "final_loss": float(metrics["loss"]),
        "final_bpp_motion": float(metrics["bpp_motion"]),
        "final_bpp_residual": float(metrics["bpp_residual"]),
        "final_psnr_train": float(metrics["psnr"]),
    }


def evaluate(trainer, state, hyper: bool):
    """Held-out pairs: REAL coded bytes through the production coders +
    eval-forward reconstruction PSNR."""
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

    rt = CodecRuntime(
        model_cfg=trainer.model_cfg,
        variables={"params": state.params, "batch_stats": state.batch_stats},
    )
    ds = make_dataset(seed=77, length=EVAL_PAIRS)  # held-out seed
    tot_bytes = 0
    psnrs = []
    n_px = 0
    for i in range(len(ds)):
        f1, f2, flow = ds[i]
        f1 = jnp.asarray(f1)[None]
        f2 = jnp.asarray(f2)[None]
        flow = jnp.asarray(flow)[None]
        out = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            f1, f2, flow, 2, train=False,
        )
        m_lat = np.asarray(out["motion_latents"], np.float32)
        r_lat = np.asarray(out["residual_latents"], np.float32)
        if hyper:
            mb, _ = rt.hyper_compress(m_lat, "motion")
            rb, _ = rt.hyper_compress(r_lat, "residual")
        else:
            mb, _ = rt.compress_motion(m_lat)
            rb, _ = rt.compress_residual(r_lat)
        tot_bytes += len(mb) + len(rb)
        rec = np.asarray(out["frame2_reconstructed_final"])
        mse = float(np.mean((rec - np.asarray(f2)) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
        n_px += CROP * CROP
    return {
        "payload_bytes": tot_bytes,
        "bpp_real": round(tot_bytes * 8 / n_px, 4),
        "psnr_eval": round(float(np.mean(psnrs)), 3),
        "pairs": EVAL_PAIRS,
    }


def pipeline_eval(trainer, state, hyper: bool):
    """Full encode -> .rdvc -> decode on a held-out clip: container bpp
    (I-frames included) + decoded PSNR — the end-to-end counterpart of
    the latent-level measurement above. Both variants ride the same
    Farneback flow so the comparison isolates the entropy model."""
    import tempfile

    from rdvc_tpu.config import CodecConfig
    from rdvc_tpu.eval.clips import coherent_clip
    from rdvc_tpu.io.yuv import write_yuv420p_frames
    from rdvc_tpu.pipeline.decode import decode_video
    from rdvc_tpu.pipeline.encode import encode_video

    h, w, n = 128, 192, 16
    frames = coherent_clip(n, h, w, seed=77)
    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "m.ckpt")
        trainer.save(state, ckpt)
        yuv = os.path.join(td, "in.yuv")
        write_yuv420p_frames(yuv, frames)
        cfg = CodecConfig()
        cfg.codec_checkpoint_path = ckpt
        cfg.input_file_path = yuv
        cfg.output_rdvc_file = os.path.join(td, "out.rdvc")
        cfg.input_rdvc_file = cfg.output_rdvc_file
        cfg.input_yuv_width, cfg.input_yuv_height = w, h
        cfg.flow_compress_height = h
        cfg.residual_compress_height = h
        cfg.raft_backend = "farneback"
        cfg.iframe_interval = 8
        mc = trainer.model_cfg
        cfg.motion_latent_channels = mc.motion_latent_channels
        cfg.residual_latent_channels = mc.residual_latent_channels
        cfg.encoder_base_channels = mc.encoder_base_channels
        cfg.mcn_base_channels = mc.mcn_base_channels
        cfg.hyperprior = hyper
        cfg.hyper_channels = mc.hyper_channels
        enc = encode_video(cfg)
        dec = decode_video(cfg, collect_frames=True)
        nbytes = os.path.getsize(cfg.output_rdvc_file)
        psnrs = []
        for src, rec in zip(frames, dec["decoded_frames"]):
            mse = np.mean(
                (src.astype(np.float64) - rec.astype(np.float64)) ** 2
            )
            psnrs.append(10 * np.log10(255.0**2 / max(mse, 1e-9)))
        return {
            "e2e_bpp": round(nbytes * 8 / (n * h * w), 4),
            "e2e_psnr": round(float(np.mean(psnrs)), 3),
            "e2e_frames": n,
            "e2e_file_bytes": nbytes,
        }


report = {
    "steps": STEPS, "crop": CROP, "batch": BATCH, "lambda_bpp": LAM,
    "arch": ("full" if FULL else ARCH),
    "device": str(jax.devices()[0]),
}
E2E = os.environ.get("AB_E2E", "1") != "0"
for name, hyper in (("factorized", False), ("hyperprior", True)):
    trainer, state, train_stats = train_variant(hyper)
    ev = evaluate(trainer, state, hyper)
    report[name] = {**train_stats, **ev}
    if E2E:
        try:
            report[name].update(pipeline_eval(trainer, state, hyper))
        except Exception as e:  # keep the latent-level numbers regardless
            report[name]["e2e_error"] = repr(e)
    print(name, json.dumps(report[name]), flush=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)

f, h = report["factorized"], report["hyperprior"]
report["rate_ratio_at_reported_psnr"] = round(
    h["bpp_real"] / max(f["bpp_real"], 1e-9), 4
)
report["psnr_delta"] = round(h["psnr_eval"] - f["psnr_eval"], 3)
with open(OUT, "w") as fo:
    json.dump(report, fo, indent=2)
print("wrote", OUT, "rate_ratio:", report["rate_ratio_at_reported_psnr"],
      "psnr_delta:", report["psnr_delta"])
