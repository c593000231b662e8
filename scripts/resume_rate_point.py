"""Resume an interrupted rate-point fine-tune from its run checkpoint.

The run checkpoint (latest_checkpoint_3phase.ckpt) stores the full
TrainConfig snapshot, so this just rebuilds the Trainer from it and
continues fit() to cfg.num_epochs, then strips to the eval .ckpt.

  python scripts/resume_rate_point.py checkpoints/rate_l1000_run \
      --out checkpoints/rate_l1000.ckpt
"""

import argparse
import dataclasses
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

np.asarray(jax.device_put(np.zeros(8, np.uint8)))  # absorb relay handshake

from rdvc_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

from rdvc_tpu.config import ModelConfig, TrainConfig
from rdvc_tpu.train.data import (
    CoherentCropDataset,
    MixtureDataset,
    SyntheticFlowPairDataset,
)
from rdvc_tpu.train.loop import Trainer


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--out", required=True)
    p.add_argument("--pairs", type=int, default=256)
    args = p.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )

    ckpt = os.path.join(args.run_dir, "latest_checkpoint_3phase.ckpt")
    with open(ckpt, "rb") as f:
        assert f.read(8) == b"RDVCCKPT"
        meta = json.loads(f.read(int.from_bytes(f.read(8), "big")))
    cfg_fields = {f.name for f in dataclasses.fields(TrainConfig)}
    cfg = TrainConfig(
        **{k: v for k, v in meta["config"].items() if k in cfg_fields}
    )
    # tuples round-trip as lists through JSON
    if cfg.crop_size:
        cfg.crop_size = tuple(cfg.crop_size)
    mdl_fields = {f.name for f in dataclasses.fields(ModelConfig)}
    model_cfg = ModelConfig(
        **{k: v for k, v in meta.get("model_config", {}).items()
           if k in mdl_fields}
    )

    dataset = MixtureDataset(
        CoherentCropDataset(size=cfg.crop_size[0], length=args.pairs // 2),
        SyntheticFlowPairDataset(size=cfg.crop_size[0], length=args.pairs // 2),
    )

    trainer = Trainer(cfg=cfg, model_cfg=model_cfg)
    state = trainer.restore(ckpt, spatial=cfg.crop_size)
    logging.info(
        "resumed %s at epoch %d (target %d)", ckpt, state.epoch,
        cfg.num_epochs,
    )
    state = dataclasses.replace(state, epoch=state.epoch + 1)
    t0 = time.time()
    state = trainer.fit(dataset, state=state)
    trainer.save(state, args.out)
    logging.info(
        "done in %.1f min -> %s", (time.time() - t0) / 60, args.out
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
