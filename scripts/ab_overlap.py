"""Does the axon relay overlap host<->device transfers with device compute?

If yes, the encode/decode pipelines can hide the ~107 ms/frame link time
behind device compute (double-buffered); if no, wall = compute + transfer
and the bench ceiling is set by their sum. Three timings each way:
  compute-only, transfer-only, interleaved (transfer issued mid-compute).

Run:  python scripts/ab_overlap.py [out.json]
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

np.asarray(jax.device_put(np.zeros(8, np.uint8)))

from rdvc_tpu.utils.profiling import device_fence, time_device

report = {}


def log(k, v):
    report[k] = v
    print(f"{k}: {json.dumps(v)}", flush=True)


# A compute workload of ~1 s: chained matmuls.
n = 4096
a = jax.device_put(np.random.randn(n, n).astype(np.float32)).astype(
    jnp.bfloat16
)


import functools


@functools.partial(jax.jit, static_argnames=("steps",))
def crunch(a, steps: int):
    def body(x, _):
        y = x @ a
        # keep magnitudes bounded so bf16 never overflows
        return y / jnp.float32(64.0).astype(jnp.bfloat16), None

    out, _ = jax.lax.scan(body, a, None, length=steps)
    return out


STEPS = 64
crunch(a, STEPS)
t_compute = time_device(lambda: crunch(a, STEPS), 2)
log("compute_only_s", round(t_compute, 3))

host_buf = np.random.randint(0, 255, size=(32 * 1024 * 1024,), dtype=np.uint8)
up = jax.device_put(host_buf)
device_fence(up)
t0 = time.perf_counter()
up = jax.device_put(host_buf)
device_fence(up)
t_upload = time.perf_counter() - t0
log("upload_only_s", round(t_upload, 3))
log("upload_mb_per_s", round(host_buf.nbytes / t_upload / 1e6, 1))

# Interleaved: dispatch compute, then immediately device_put, then fence.
t0 = time.perf_counter()
out = crunch(a, STEPS)
up = jax.device_put(host_buf)
device_fence((out, up))
t_inter_up = time.perf_counter() - t0
log("compute_plus_upload_interleaved_s", round(t_inter_up, 3))
log("upload_overlaps_compute",
    bool(t_inter_up < t_compute + 0.6 * t_upload))

# Download overlap: dispatch compute, then asarray a previously-computed
# big device array.
big = jax.device_put(np.random.randint(0, 255, (32 * 1024 * 1024,),
                                       dtype=np.uint8))
device_fence(big)


@jax.jit
def fresh(x):
    return x ^ jnp.uint8(1)


fb = fresh(big)
np.asarray(fb)  # warm path
fb = fresh(big)
device_fence(fb)
t0 = time.perf_counter()
host = np.asarray(fb)
t_download = time.perf_counter() - t0
log("download_only_s", round(t_download, 3))
log("download_mb_per_s", round(host.nbytes / t_download / 1e6, 1))

fb2 = fresh(big)
device_fence(fb2)
t0 = time.perf_counter()
out = crunch(a, STEPS)
host = np.asarray(fb2)  # already-computed array: pure transfer
device_fence(out)
t_inter_down = time.perf_counter() - t0
log("compute_plus_download_interleaved_s", round(t_inter_down, 3))
log("download_overlaps_compute",
    bool(t_inter_down < t_compute + 0.6 * t_download))

out_path = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/ab_overlap.json"
os.makedirs(os.path.dirname(out_path), exist_ok=True)
with open(out_path, "w") as f:
    json.dump(report, f, indent=2)
print("wrote", out_path)
