"""Held-out EPE measurement for flow backends (VERDICT r2 item #3).

The reference's encoder quality rests on its RAFT checkpoint
(/root/reference/codec_processing.py:1244-1308, invocation 1436-1444); no
pretrained Sintel weights exist in this environment, so the JAX RAFT is
trained on synthetic flow data and its end-point-error is measured here on
held-out synthetic pairs — published next to the RD tables so the flow-
quality axis is not a blind spot.

CLI: python -m rdvc_tpu.eval.epe --raft checkpoints/demo_raft.ckpt
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import numpy as np

log = logging.getLogger(__name__)


def mean_epe(flow_pred: np.ndarray, flow_gt: np.ndarray) -> float:
    """Average end-point error over all pixels (standard RAFT metric)."""
    d = np.asarray(flow_pred, np.float64) - np.asarray(flow_gt, np.float64)
    return float(np.mean(np.sqrt(np.sum(d * d, axis=-1))))


def evaluate_flow_backend(
    flow_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    dataset,
    max_items: Optional[int] = None,
) -> Dict[str, float]:
    """EPE of `flow_fn(f1, f2) -> (1, H, W, 2)` over a (f1, f2, flow_gt)
    dataset. Frames are float [0,1] HWC."""
    n = len(dataset) if max_items is None else min(max_items, len(dataset))
    epes = []
    for i in range(n):
        f1, f2, gt = dataset[i]
        pred = np.asarray(flow_fn(f1, f2))
        if pred.ndim == 4:
            pred = pred[0]
        epes.append(mean_epe(pred, gt))
    return {
        "epe_mean": float(np.mean(epes)),
        "epe_median": float(np.median(epes)),
        "epe_max": float(np.max(epes)),
        "items": n,
    }


def raft_flow_fn(checkpoint_path: Optional[str], iters: int = 12):
    """flow_fn for the JAX RAFT at the native pair resolution."""
    import jax.numpy as jnp

    from rdvc_tpu.models.raft import RaftRunner

    runner = RaftRunner(iters=iters, checkpoint_path=checkpoint_path)

    def fn(f1, f2):
        a = jnp.asarray(f1[None], jnp.float32)
        b = jnp.asarray(f2[None], jnp.float32)
        return np.asarray(runner.model.apply(runner.variables, a, b, train=False))

    return fn


def farneback_flow_fn():
    from rdvc_tpu.pipeline.flow import make_flow_backend

    return make_flow_backend("farneback")


def heldout_dataset(size: int = 96, length: int = 32, seed: int = 77):
    """Held-out mixture (seeds disjoint from training seeds 0/1)."""
    from rdvc_tpu.train.data import (
        CoherentCropDataset,
        MixtureDataset,
        SyntheticFlowPairDataset,
    )

    return MixtureDataset(
        CoherentCropDataset(size=size, length=length // 2, seed=seed),
        SyntheticFlowPairDataset(size=size, length=length // 2, seed=seed),
    )


def main(argv=None) -> int:
    import argparse
    import json

    p = argparse.ArgumentParser(description="flow-backend EPE eval")
    p.add_argument("--raft", type=str, default="checkpoints/demo_raft.ckpt")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--items", type=int, default=32)
    p.add_argument("--farneback", action="store_true",
                   help="also evaluate the host Farneback fallback")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    ds = heldout_dataset(size=args.size, length=args.items)
    report = {
        "dataset": f"synthetic held-out mixture (seed 77, {args.size}px, "
        f"{args.items} pairs)",
    }
    report["raft"] = evaluate_flow_backend(
        raft_flow_fn(args.raft, iters=args.iters), ds
    )
    report["raft"]["checkpoint"] = args.raft
    zero = evaluate_flow_backend(lambda a, b: np.zeros(a.shape[:2] + (2,)), ds)
    report["zero_flow_baseline"] = zero
    if args.farneback:
        try:
            report["farneback"] = evaluate_flow_backend(
                farneback_flow_fn(), ds
            )
        except Exception as e:
            report["farneback"] = {"error": str(e)}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
