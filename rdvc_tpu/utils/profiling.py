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


def fence_overhead(samples: int = 3) -> float:
    """Measured cost of one device_fence on an idle queue: the tiny-reduce
    dispatch + few-byte relay download round trip. On the axon relay this
    is 0.3-3 s and VARIABLE — it must be amortized/subtracted, or every
    sub-300ms/dispatch stage measurement is pure link noise (this is what
    made round-3's profile_stages numbers irreconcilable: a '39 ms/frame'
    update block inside a RAFT whose 8 extra iterations cost 1.8 ms)."""
    x = jax.device_put(np.zeros(8, np.float32))
    device_fence(x)  # warm _tiny_reduce compile + queue drain
    best = float("inf")
    for _ in range(max(1, samples)):
        t0 = time.perf_counter()
        device_fence(x)
        best = min(best, time.perf_counter() - t0)
    return best


def time_device(
    fn: Callable[[], object],
    iters: int = 3,
    min_loop_s: float = 4.0,
    trials: int = 2,
    max_iters: int = 400,
) -> float:
    """Seconds per iteration of fn()'s DEVICE work.

    fn dispatches (already compiled — call once before to warm) and returns
    device arrays; ONE fence materializes after all iters.

    The fence round trip through the axon relay is 0.03-3 s and VARIABLE
    (load-dependent) — subtracting a one-shot measured overhead is not
    enough: round-3's numbers had 4-iteration RAFT reading slower than
    12-iteration because a single ±1 s fence swamped sub-second loops. So:
    (a) the loop is scaled until it runs >= min_loop_s of device work (any
    fence tail is then a bounded fraction), and (b) the whole loop repeats
    `trials` times taking the MIN total — min-statistics cut the fence's
    one-sided (always-positive) noise tail. The idle-queue fence minimum is
    still subtracted as the residual bias."""
    out = fn()
    device_fence(out)  # warm + drain queue
    ov = fence_overhead(2)

    def run(n: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn()
        device_fence(o)
        return time.perf_counter() - t0

    total = run(iters)
    n = iters
    if total < min_loop_s and n < max_iters:
        per = max((total - ov) / n, 1e-4)
        n = int(min(max_iters, max(n, np.ceil(min_loop_s / per))))
        total = run(n)
    for _ in range(max(0, trials - 1)):
        total = min(total, run(n))
    return max(total - ov, 1e-9) / max(1, n)


def dispatch_floor(samples: int = 5) -> float:
    """Per-dispatch relay overhead: seconds to dispatch one trivial jitted
    op in a loop (no fence inside). Stage loops pay ~this per fn() call
    serially whenever the stage's device time is SMALLER than the dispatch
    round trip — the loop then measures max(dispatch, device), so isolated
    times for tiny stages are upper bounds pinned at this floor (round-3
    artifact: an 'update block 39-74 ms' whose true in-graph marginal cost
    is 6.9 ms — the rest was this floor)."""
    x = jax.device_put(np.zeros((8, 128), np.float32))
    y = _fresh_copy(x)
    device_fence(y)
    n = max(3, samples)
    t0 = time.perf_counter()
    for _ in range(n):
        y = _fresh_copy(y)
    device_fence(y)
    return max(0.0, (time.perf_counter() - t0) / n)


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
