"""Supervised RAFT training (sequence EPE loss).

The reference consumed separately fine-tuned RAFT checkpoints
(raft_checkpoint_dir='./raft_checkpoints_amp_epe',
/root/reference/codec_processing.py:646-647); this provides the training
harness: the standard RAFT objective sum_i gamma^(N-1-i) * L1(flow_i, gt)
over all iteration outputs (RAFT paper eq. 7), Adam + clipping, bf16
compute, checkpointing compatible with RaftRunner.

CLI: python -m rdvc_tpu.train.raft_train --synthetic --epochs 20
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rdvc_tpu.models.raft import RAFT
from rdvc_tpu.train.data import SyntheticFlowPairDataset, batch_iterator
from rdvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

log = logging.getLogger(__name__)


@dataclasses.dataclass
class RaftTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: int = 0
    step: int = 0


class RaftTrainer:
    def __init__(
        self,
        iters: int = 8,
        lr: float = 2e-4,
        gamma: float = 0.8,
        grad_clip: float = 1.0,
        weight_decay: float = 1e-5,
    ):
        self.model = RAFT(iters=iters)
        self.gamma = gamma
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(lr, weight_decay=weight_decay),
        )
        self._jitted = None

    def init_state(self, seed: int = 0, spatial=(96, 96)) -> RaftTrainState:
        dummy = jnp.zeros((1, spatial[0], spatial[1], 3), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(seed), dummy, dummy)
        return RaftTrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
        )

    def _loss(self, params, batch_stats, f1, f2, gt):
        (final, ups), updates = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            f1, f2, train=True, return_all=True,
            mutable=["batch_stats"],
        )
        n = ups.shape[0]
        weights = self.gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
        per_iter = jnp.mean(jnp.abs(ups - gt[None]), axis=(1, 2, 3, 4))
        loss = jnp.sum(weights * per_iter)
        epe = jnp.mean(
            jnp.sqrt(jnp.sum(jnp.square(final - gt), axis=-1))
        )
        return loss, (updates["batch_stats"], epe)

    def train_step(
        self, state: RaftTrainState, batch
    ) -> Tuple[RaftTrainState, dict]:
        if self._jitted is None:

            def step(params, batch_stats, opt_state, f1, f2, gt):
                (loss, (bs, epe)), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, batch_stats, f1, f2, gt)
                updates, new_opt = self.tx.update(grads, opt_state, params)
                return (
                    optax.apply_updates(params, updates),
                    bs, new_opt, loss, epe,
                )

            self._jitted = jax.jit(step, donate_argnums=(0, 2))
        f1, f2, gt = (jnp.asarray(x, jnp.float32) for x in batch)
        params, bs, opt, loss, epe = self._jitted(
            state.params, state.batch_stats, state.opt_state, f1, f2, gt
        )
        new_state = dataclasses.replace(
            state, params=params, batch_stats=bs, opt_state=opt,
            step=state.step + 1,
        )
        return new_state, {"loss": float(loss), "epe": float(epe)}

    def save(self, state: RaftTrainState, path: str) -> str:
        save_checkpoint(
            path,
            {"params": state.params, "batch_stats": state.batch_stats},
            metadata={"epoch": state.epoch, "step": state.step,
                      "iters": self.model.iters},
        )
        return path

    def restore(self, path: str, spatial=(96, 96)) -> RaftTrainState:
        state = self.init_state(spatial=spatial)
        variables, meta = load_checkpoint(
            path, {"params": state.params, "batch_stats": state.batch_stats}
        )
        return dataclasses.replace(
            state,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            epoch=int(meta.get("epoch", 0)),
            step=int(meta.get("step", 0)),
        )

    def fit(
        self,
        dataset,
        batch_size: int = 8,
        num_epochs: int = 20,
        state: Optional[RaftTrainState] = None,
        checkpoint_path: Optional[str] = None,
        log_every: int = 32,
        seed: int = 0,
    ) -> RaftTrainState:
        state = state or self.init_state(seed=seed)
        for epoch in range(state.epoch + 1, num_epochs + 1):
            t0 = time.time()
            agg = {"loss": 0.0, "epe": 0.0}
            n = 0
            for batch in batch_iterator(dataset, batch_size, seed=seed + epoch):
                state, m = self.train_step(state, batch)
                for k in agg:
                    agg[k] += m[k]
                n += 1
                if n % log_every == 0:
                    log.info(
                        "raft epoch %d batch %d: loss %.4f epe %.4f",
                        epoch, n, agg["loss"] / n, agg["epe"] / n,
                    )
            state = dataclasses.replace(state, epoch=epoch)
            log.info(
                "raft epoch %d done in %.1fs: loss %.4f epe %.4f",
                epoch, time.time() - t0, agg["loss"] / max(n, 1),
                agg["epe"] / max(n, 1),
            )
            if checkpoint_path:
                self.save(state, checkpoint_path)
        return state


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="RAFT supervised training")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_length", type=int, default=512)
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--checkpoint", type=str, default="./raft_checkpoints/raft.ckpt")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--frames", type=str, default=None)
    p.add_argument("--flows", type=str, default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    if args.synthetic or not args.frames:
        dataset = SyntheticFlowPairDataset(
            size=args.size, length=args.synthetic_length
        )
    else:
        from rdvc_tpu.train.data import VimeoFlowPairDataset

        dataset = VimeoFlowPairDataset(
            args.frames, args.flows, crop_size=(args.size, args.size)
        )
    trainer = RaftTrainer(iters=args.iters, lr=args.lr)
    state = None
    if args.resume and os.path.exists(args.resume):
        state = trainer.restore(args.resume, spatial=(args.size, args.size))
        logging.info("resumed RAFT from %s (epoch %d)", args.resume, state.epoch)
    trainer.fit(
        dataset,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        state=state,
        checkpoint_path=args.checkpoint,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
