"""Device-time isolation + FLOPs accounting (VERDICT r2 item #1).

The axon relay conflates queue-wait with stage time in ordinary wall-clock
spans (dispatch blocks while the device is busy, and the first readback
pays a long handshake), and `jax.block_until_ready` does not reliably
block here (CLAUDE.md). The only trustworthy fence is a host
materialization; to time DEVICE work without paying a bulk download, the
fence materializes a few-byte reduction that depends on the timed outputs
— TPU launches execute in order, so those bytes landing implies all prior
dispatched work finished.

Also exposes XLA's own cost model (`compiled_cost`) so benches can publish
FLOPs/frame and MFU instead of guessing.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _tiny_reduce(x):
    return x.ravel()[:8].astype(jnp.float32).sum()


def device_fence(out) -> float:
    """Block until every device op dispatched so far (in-order queue) has
    completed, downloading only a handful of bytes. `out` is any pytree of
    device arrays from the timed computation."""
    leaf = next(
        (l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ravel")),
        None,
    )
    if leaf is None:
        return 0.0
    return float(np.asarray(_tiny_reduce(leaf)))


def time_device(fn: Callable[[], object], iters: int = 3) -> float:
    """Seconds per iteration of fn()'s DEVICE work: fn dispatches (already
    compiled — call once before to warm) and returns device arrays; the
    fence materializes once after all iters."""
    out = fn()
    device_fence(out)  # warm + drain queue
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    device_fence(out)
    return (time.perf_counter() - t0) / max(1, iters)


@jax.jit
def _fresh_copy(x):
    return x + jnp.zeros((), x.dtype)


def time_transfer_down(arr, iters: int = 2) -> Dict[str, float]:
    """Measured device->host bandwidth for a REAL bulk download.

    np.asarray on the same jax.Array reuses its cached host copy (a second
    call returns in microseconds and measures nothing) — so each iteration
    downloads a FRESH device array (a trivial on-device add; its ~ms of
    bandwidth is noise next to the multi-second relay download)."""
    y = _fresh_copy(arr)
    np.asarray(y)  # first-readback handshake + compile paid here
    t0 = time.perf_counter()
    for _ in range(iters):
        host = np.asarray(_fresh_copy(arr))
    dt = (time.perf_counter() - t0) / iters
    return {"seconds": dt, "mb_per_s": host.nbytes / max(dt, 1e-9) / 1e6}


def time_transfer_up(host_arr: np.ndarray, iters: int = 2) -> Dict[str, float]:
    """Measured host->device bandwidth (device_put + fence)."""
    device_fence(jax.device_put(host_arr))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.device_put(host_arr)
    device_fence(out)
    dt = (time.perf_counter() - t0) / iters
    return {"seconds": dt, "mb_per_s": host_arr.nbytes / max(dt, 1e-9) / 1e6}


def compiled_cost(jitted, *args, **kwargs) -> Dict[str, float]:
    """XLA's cost analysis of a jitted callable on these args:
    {'flops': ..., 'bytes': ...} (zeros if the backend reports none)."""
    compiled = jitted.lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    ca = dict(ca or {})
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


# TPU v5e peak dense bf16 matmul throughput (jax-ml.github.io/scaling-book
# hardware table); the MFU denominator for all published numbers.
V5E_PEAK_FLOPS = 197e12


def mfu(flops: float, seconds: float, peak: float = V5E_PEAK_FLOPS) -> float:
    return flops / max(seconds, 1e-12) / peak
