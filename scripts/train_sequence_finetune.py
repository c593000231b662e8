"""Sequence-unrolled fine-tune (VERDICT r3 item #4b): damp the multi-step
error accumulation behind long-GOP drift.

Fine-tunes an existing rate-point checkpoint with the unrolled loss
(VideoCodec.forward_sequence): each unroll step warps the PREVIOUS
RECONSTRUCTION — decoder semantics (codec_processing.py:1941) — instead of
the GT previous frame the pairwise loss uses, so the model learns to emit
reconstructions that survive being re-warped 31 times. The encode-time
design is untouched (the reference predicts from ground-truth frames,
codec_processing.py:1499; batching legality is preserved).

Run on the real TPU:
  python scripts/train_sequence_finetune.py --base checkpoints/rate_l3.ckpt \
      [--hyperprior] [--unroll 4] [--epochs 8] [--out checkpoints/rate_l3_seq.ckpt]
"""

import argparse
import dataclasses
import logging
import os
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax

np.asarray(jax.device_put(np.zeros(8, np.uint8)))  # absorb relay handshake

from rdvc_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

from rdvc_tpu.config import ModelConfig, TrainConfig
from rdvc_tpu.train.data import CoherentCropSequenceDataset
from rdvc_tpu.train.loop import Trainer


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--base", type=str, required=True)
    p.add_argument("--out", type=str, default="")
    p.add_argument("--unroll", type=int, default=4,
                   help="frames per training sequence (unroll-1 P-steps)")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--seqs", type=int, default=128)
    p.add_argument("--lambda_bpp", type=float, default=0.0,
                   help="override both bpp lambdas (0 = keep the base "
                        "checkpoint's TrainConfig defaults of 1.0)")
    p.add_argument("--lambda_seq_recon", type=float, default=1000.0)
    p.add_argument("--hyperprior", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )

    out = args.out or args.base.replace(".ckpt", "_seq.ckpt")
    cfg = TrainConfig()
    cfg.batch_size = args.batch_size
    cfg.crop_size = (args.crop, args.crop)
    cfg.lambda_seq_recon = args.lambda_seq_recon
    if args.lambda_bpp > 0:
        cfg.lambda_bpp_motion = args.lambda_bpp
        cfg.lambda_bpp_residual = args.lambda_bpp
    cfg.real_bitstream_check_every = 0
    cfg.vis_dir = ""
    cfg.checkpoint_dir = out.replace(".ckpt", "_run")
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)

    model_cfg = ModelConfig()
    if args.hyperprior:
        model_cfg = dataclasses.replace(model_cfg, hyperprior=True)
    trainer = Trainer(cfg=cfg, model_cfg=model_cfg)
    state = trainer.restore(args.base, spatial=cfg.crop_size)
    logging.info("resumed %s at epoch %d", args.base, state.epoch)
    start = state.epoch + 1
    # Whole fine-tune runs in phase 2 (full model, reconstructed-flow warp
    # + MCN — the decoder path); the seq loss adds the last-step recon MSE.
    cfg.phase1_epochs = 0
    cfg.phase3_start_epoch = start + args.epochs + 1
    cfg.num_epochs = start + args.epochs - 1
    state = dataclasses.replace(state, epoch=start)

    dataset = CoherentCropSequenceDataset(
        size=args.crop, length=args.seqs, seq_len=args.unroll,
    )
    t0 = time.time()
    state = trainer.fit(dataset, state=state)
    trainer.save(state, out)
    logging.info(
        "sequence fine-tune done in %.1f min -> %s",
        (time.time() - t0) / 60, out,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
