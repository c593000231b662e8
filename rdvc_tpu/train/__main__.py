"""Training entry point.

Reference equivalent: `python new_train.py` (no args,
/root/reference/new_train.py:1089) — here with a CLI for the data roots,
phase-3 variant (new_train/train_msssim/train_psnr behaviors), resume, and a
--synthetic smoke mode that needs no dataset.

Usage:
    python -m rdvc_tpu.train --frames DIR --flows DIR [--epochs N] ...
    python -m rdvc_tpu.train --synthetic --epochs 2   # smoke run
"""

from __future__ import annotations

import argparse
import logging
import os

from rdvc_tpu.config import ModelConfig, TrainConfig


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="rdvc_tpu 3-phase training")
    p.add_argument("--frames", type=str, default=None, help="frame_base_dir")
    p.add_argument("--flows", type=str, default=None, help="flow_base_dir")
    p.add_argument("--synthetic", action="store_true",
                   help="use the procedural dataset (smoke/no-data runs)")
    p.add_argument("--synthetic_coherent", action="store_true",
                   help="procedural mixture incl. coherent-translation "
                   "pairs (the eval-clip content family; use for RD "
                   "checkpoints)")
    p.add_argument("--synthetic_length", type=int, default=None,
                   help="pairs in the synthetic dataset (default 4*batch)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--crop", type=int, default=None, help="square crop size")
    p.add_argument("--phase3_variant", choices=["full", "res_ae", "psnr"],
                   default=None)
    p.add_argument("--phase1_epochs", type=int, default=None)
    p.add_argument("--phase3_start_epoch", type=int, default=None)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path to resume from")
    p.add_argument("--data_parallel", type=int, default=None,
                   help="number of devices for the data mesh (default: all)")
    p.add_argument("--lambda_bpp", type=float, default=None,
                   help="override both bpp loss weights (rate emphasis)")
    p.add_argument("--hyperprior", action="store_true",
                   help="train the mean-scale hyperprior model variant")
    p.add_argument("--hyper_channels", type=int, default=None)
    p.add_argument("--log_every", type=int, default=50)
    args = p.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )

    cfg = TrainConfig()
    if args.frames:
        cfg.frame_base_dir = args.frames
    if args.flows:
        cfg.flow_base_dir = args.flows
    for name, val in (
        ("num_epochs", args.epochs),
        ("batch_size", args.batch_size),
        ("phase3_variant", args.phase3_variant),
        ("phase1_epochs", args.phase1_epochs),
        ("phase3_start_epoch", args.phase3_start_epoch),
        ("checkpoint_dir", args.checkpoint_dir),
    ):
        if val is not None:
            setattr(cfg, name, val)
    if args.crop:
        cfg.crop_size = (args.crop, args.crop)
    if args.lambda_bpp is not None:
        cfg.lambda_bpp_motion = args.lambda_bpp
        cfg.lambda_bpp_residual = args.lambda_bpp

    from rdvc_tpu.parallel import make_data_mesh
    from rdvc_tpu.train.data import SyntheticFlowPairDataset, VimeoFlowPairDataset
    from rdvc_tpu.train.loop import Trainer

    import jax

    mesh = None
    n_dev = args.data_parallel or jax.device_count()
    if n_dev > 1:
        mesh = make_data_mesh(n_dev)
        if cfg.batch_size % n_dev:
            cfg.batch_size = max(n_dev, cfg.batch_size - cfg.batch_size % n_dev)
            logging.info("batch_size rounded to %d for %d devices",
                         cfg.batch_size, n_dev)

    if args.synthetic or args.synthetic_coherent:
        size = cfg.crop_size[0] if cfg.crop_size else 64
        length = args.synthetic_length or 4 * cfg.batch_size
        if args.synthetic_coherent:
            from rdvc_tpu.train.data import (
                CoherentCropDataset,
                MixtureDataset,
            )

            dataset = MixtureDataset(
                CoherentCropDataset(size=size, length=length // 2),
                SyntheticFlowPairDataset(size=size, length=length // 2),
            )
        else:
            dataset = SyntheticFlowPairDataset(size=size, length=length)
        cfg.real_bitstream_check_every = 0
    else:
        dataset = VimeoFlowPairDataset(
            cfg.frame_base_dir, cfg.flow_base_dir, crop_size=cfg.crop_size
        )
        if len(dataset) == 0:
            raise SystemExit(
                f"no training pairs under {cfg.frame_base_dir} / {cfg.flow_base_dir}"
            )
    logging.info("dataset: %d pairs; devices: %d", len(dataset), n_dev)

    model_cfg = ModelConfig()
    if args.hyperprior:
        import dataclasses as _dc

        model_cfg = _dc.replace(
            model_cfg,
            hyperprior=True,
            **(
                {"hyper_channels": args.hyper_channels}
                if args.hyper_channels
                else {}
            ),
        )
    trainer = Trainer(cfg=cfg, model_cfg=model_cfg, mesh=mesh)
    state = None
    if args.resume and os.path.exists(args.resume):
        state = trainer.restore(args.resume, spatial=cfg.crop_size or (64, 64))
        logging.info("resumed from %s at epoch %d", args.resume, state.epoch)
    trainer.fit(dataset, state=state, log_every=args.log_every)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
