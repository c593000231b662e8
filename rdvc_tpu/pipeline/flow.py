"""Optical-flow backends for the encoder.

The reference probes torchvision/local RAFT backends
(/root/reference/codec_processing.py:38-82, 1209-1308). Here:

  * "raft"      — the JAX RAFT reimplementation (rdvc_tpu.models.raft),
                  jitted on device; the default.
  * "farneback" — cv2 Farneback on host (dependency-light fallback /
                  smoke-test backend; no learned weights needed).
  * "zero"      — zero flow (degenerate baseline for tests).

All backends take/return RGB float [0,1] numpy frames at the RAFT working
resolution and return (1, H, W, 2) float32 flow (dx, dy in pixels).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

FlowFn = Callable[[np.ndarray, np.ndarray], np.ndarray]


def zero_flow(frame1: np.ndarray, frame2: np.ndarray) -> np.ndarray:
    h, w = frame1.shape[:2]
    return np.zeros((1, h, w, 2), np.float32)


def farneback_flow(frame1: np.ndarray, frame2: np.ndarray) -> np.ndarray:
    import cv2

    g1 = cv2.cvtColor((frame1 * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    g2 = cv2.cvtColor((frame2 * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    flow = cv2.calcOpticalFlowFarneback(
        g1, g2, None,
        pyr_scale=0.5, levels=5, winsize=15, iterations=3,
        poly_n=5, poly_sigma=1.2, flags=0,
    )
    return flow[None].astype(np.float32)


def make_flow_backend(
    name: str,
    raft_variables: Optional[dict] = None,
    raft_iters: int = 12,
    raft_checkpoint_path: Optional[str] = None,
) -> FlowFn:
    name = (name or "auto").lower()
    if name in ("auto", "raft", "jax"):
        try:
            from rdvc_tpu.models.raft import RaftRunner

            runner = RaftRunner(
                variables=raft_variables,
                iters=raft_iters,
                checkpoint_path=raft_checkpoint_path,
            )
            return runner.estimate
        except Exception:
            if name != "auto":
                raise
            return farneback_flow
    if name == "farneback":
        return farneback_flow
    if name == "zero":
        return zero_flow
    raise ValueError(f"unknown flow backend: {name}")
