"""Relay link probes: device->host throughput vs buffer size, and whether
a download can overlap device compute (the decode pipeline's fps ceiling
is 1/max(compute, download) only if overlap is real).

Run:  python scripts/probe_link.py [out.json]
"""

import json
import os
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jax.device_put(np.zeros(8, np.uint8)))  # absorb relay handshake

from rdvc_tpu.utils.profiling import device_fence, time_transfer_down

report = {}


def log(k, v):
    report[k] = v
    print(f"{k}: {json.dumps(v)}", flush=True)


# ---------------- size sweep ----------------
for mb in (3, 10, 28, 100, 200):
    n = mb * 1_000_000
    arr = jax.device_put(np.zeros(n, np.uint8))
    r = time_transfer_down(arr, iters=2)
    log(f"down_{mb}mb", {"mb_per_s": round(r["mb_per_s"], 2)})

# 2D u8 layout like decode frames (T, G, 1620, 1920)
fr = jax.device_put(np.zeros((16, 2, 1620, 1920), np.uint8))
r = time_transfer_down(fr, iters=2)
log("down_frames_4d_100mb", {"mb_per_s": round(r["mb_per_s"], 2)})

# ---------------- overlap probe ----------------
# Dispatch a long-running compute, then immediately download an unrelated
# buffer. If the link is independent of the execution stream, the download
# completes in ~buffer/bandwidth; if serialized, it waits for the compute.
x = jax.device_put(np.random.rand(4, 2048, 2048).astype(np.float32))
dl = jax.device_put(np.zeros(28_000_000, np.uint8))


@jax.jit
def burn(a):
    def body(i, a):
        return jnp.tanh(a @ a[0] @ jnp.swapaxes(a, 1, 2)[0] + i)
    return jax.lax.fori_loop(0, 60, body, a)


burn(x)
device_fence(burn(x))  # warm + drain

t0 = time.perf_counter()
out = burn(x)
t_dispatch = time.perf_counter() - t0
t0 = time.perf_counter()
host = np.asarray(dl)
t_download = time.perf_counter() - t0
t0 = time.perf_counter()
device_fence(out)
t_rest = time.perf_counter() - t0
log("overlap", {
    "dispatch_s": round(t_dispatch, 3),
    "download_during_compute_s": round(t_download, 3),
    "compute_remaining_s": round(t_rest, 3),
})

# reference: download with idle device
t0 = time.perf_counter()
np.asarray(jax.device_put(np.zeros(28_000_000, np.uint8)) + 0)
log("download_idle_s", round(time.perf_counter() - t0, 3))

out_path = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/probe_link.json"
os.makedirs(os.path.dirname(out_path), exist_ok=True)
with open(out_path, "w") as f:
    json.dump(report, f, indent=2)
print("wrote", out_path)
