"""Focused RAFT stage profile (VERDICT r3 item #2 attribution).

Round 3's profile_stages numbers for the RAFT stages were fence-noise:
stage times summed to 138 ms inside a 66.6 ms encode_chain, and 8 extra
GRU iterations read as free (4it 54.5 ms vs 12it 56.3 ms). utils/
profiling.time_device now measures and subtracts the fence round trip and
auto-scales the loop until device work dominates; this script re-measures
ONLY the RAFT pieces so the GRU-fusion work (models/raft/fast_update.py)
is aimed at real numbers.

Run on the real TPU:  python scripts/profile_raft.py [out.json]
Env: PROF_B (default 8), PROF_ITERS (default 3)
"""

import json
import os
import sys

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jax.device_put(np.zeros(8, np.uint8)))  # absorb relay handshake

from rdvc_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

from rdvc_tpu.models.raft import RaftRunner
from rdvc_tpu.models.raft.corr import build_corr_pyramid, corr_lookup
from rdvc_tpu.utils.profiling import fence_overhead, time_device

B = int(os.environ.get("PROF_B", "8"))
ITERS = int(os.environ.get("PROF_ITERS", "3"))
H, W = 368, 640

report = {"B": B, "iters": ITERS, "device": str(jax.devices()[0])}
OUT = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/profile_raft.json"
os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)


def log(name, val):
    report[name] = val
    print(name, json.dumps(val), flush=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)


log("fence_overhead_s", fence_overhead(3))

ckpt = "checkpoints/demo_raft.ckpt"
runner = RaftRunner(
    iters=4, checkpoint_path=ckpt if os.path.exists(ckpt) else None
)
rng = np.random.RandomState(0)
a = jax.device_put(rng.rand(B, H, W, 3).astype(np.float32))
b = jax.device_put(rng.rand(B, H, W, 3).astype(np.float32))

# Full forward at 4 and 12 iters
for it in (4, 12):
    r = RaftRunner(
        iters=it, variables=runner.variables
    )
    r._jitted(r.variables, a, b)  # compile
    t = time_device(lambda r=r: r._jitted(r.variables, a, b), ITERS)
    log(f"raft_{it}it_ms_per_frame", t / B * 1e3)

model = runner.model
variables = runner.variables

# Encoders only (fnet x2 + cnet)
enc_fn = jax.jit(
    lambda v, x, y: (
        model.apply(v, x, train=False, method=lambda m, x, train: m.fnet(x, train=train)),
        model.apply(v, y, train=False, method=lambda m, x, train: m.fnet(x, train=train)),
        model.apply(v, x, train=False, method=lambda m, x, train: m.cnet(x, train=train)),
    )
)
f1, f2, cf = enc_fn(variables, a * 2 - 1, b * 2 - 1)
t = time_device(lambda: enc_fn(variables, a * 2 - 1, b * 2 - 1), ITERS)
log("raft_encoders_ms_per_frame", t / B * 1e3)

# Corr pyramid
pyr_fn = jax.jit(lambda x, y: build_corr_pyramid(x, y, 4))
pyr = pyr_fn(f1, f2)
t = time_device(lambda: pyr_fn(f1, f2), ITERS)
log("corr_pyramid_ms_per_frame", t / B * 1e3)

# Corr lookup (one iteration's worth)
h8, w8 = H // 8, W // 8
coords = jax.device_put(
    np.stack(
        np.meshgrid(
            np.arange(w8, dtype=np.float32),
            np.arange(h8, dtype=np.float32),
        ),
        -1,
    )[None].repeat(B, 0)
    + rng.rand(B, h8, w8, 2).astype(np.float32) * 3
)
look_fn = jax.jit(lambda p, c: corr_lookup(p, c, 4))
corr = look_fn(pyr, coords)
t = time_device(lambda: look_fn(pyr, coords), ITERS)
log("corr_lookup_1it_ms_per_frame", t / B * 1e3)

# Update block (one iteration)
hidden = jnp.tanh(cf[..., :128])
context = jax.nn.relu(cf[..., 128:])
flow = jax.device_put(rng.rand(B, h8, w8, 2).astype(np.float32))


def upd(v, hh, cc, co, fl):
    return model.apply(
        v, hh, cc, co, fl,
        method=lambda m, hh, cc, co, fl: m.update_block(hh, cc, co, fl),
    )


upd_fn = jax.jit(upd)
out = upd_fn(variables, hidden, context, corr, flow)
t = time_device(lambda: upd_fn(variables, hidden, context, corr, flow), ITERS)
log("update_block_1it_ms_per_frame", t / B * 1e3)

# lookup+update together (the per-iteration body minus the scan/pyramid)
def body(v, p, hh, cc, fl, c0):
    co = corr_lookup(p, c0 + fl, 4)
    return model.apply(
        v, hh, cc, co, fl,
        method=lambda m, hh, cc, co, fl: m.update_block(hh, cc, co, fl),
    )


body_fn = jax.jit(body)
c0 = coords - flow
out = body_fn(variables, pyr, hidden, context, flow, c0)
t = time_device(
    lambda: body_fn(variables, pyr, hidden, context, flow, c0), ITERS
)
log("iter_body_1it_ms_per_frame", t / B * 1e3)

print(json.dumps(report))
