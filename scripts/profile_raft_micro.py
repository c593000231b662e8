"""In-dispatch micro-profile of the RAFT encoder pieces.

profile_raft.py showed the whole RAFT forward running at ~1% MFU with the
encoders dominating (~50-60 ms/frame for ~96 GFLOP that should take <1 ms
at peak). Loop-of-dispatches timing cannot attribute further: each relay
dispatch costs a variable 40-400 ms round trip. This script times each
piece by running it K and 2K times INSIDE one jitted lax.fori_loop (the
output is fed back through a cheap scalar so XLA cannot hoist or dead-code
the body) and reports (t(2K) - t(K)) / K — dispatch and fence overheads
cancel exactly in the difference.

Also calibrates the chip itself: a big bf16 matmul (MXU speed-of-light
check) and a plain 3x3 conv at the encoder's stage-1 shape.

Run on the real TPU:  python scripts/profile_raft_micro.py [out.json]
"""

import functools
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

from rdvc_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

from rdvc_tpu.models.raft import RaftRunner
from rdvc_tpu.utils.profiling import device_fence

B = int(os.environ.get("PROF_B", "8"))
K = int(os.environ.get("PROF_K", "8"))
H, W = 368, 640

report = {"B": B, "K": K, "device": str(jax.devices()[0])}
OUT = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/profile_raft_micro.json"
os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)


def log(name, val):
    report[name] = val
    print(name, json.dumps(val), flush=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)


def timed_loop(piece, x, k):
    """One dispatch running piece k times serially; returns wall seconds.

    The carry mixes a scalar of each output back into the input so the loop
    body cannot be hoisted (inputs change every iteration) or elided."""

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, k):
        def body(i, c):
            y = piece(c)
            s = jnp.sum(y.ravel()[:1]).astype(c.dtype) * jnp.float32(1e-12).astype(c.dtype)
            return c + s
        return jax.lax.fori_loop(0, k, body, x)

    out = run(x, k)
    device_fence(out)  # compile + drain
    t0 = time.perf_counter()
    out = run(x, k)
    device_fence(out)
    return time.perf_counter() - t0


def per_iter_ms(piece, x):
    t1 = timed_loop(piece, x, K)
    t2 = timed_loop(piece, x, 2 * K)
    return max(t2 - t1, 1e-9) / K * 1e3


# ---- chip calibration: big bf16 matmul ----
a = jax.device_put(np.random.rand(8192, 8192).astype(np.float32)).astype(jnp.bfloat16)


def mm(x):
    return (x @ x).astype(jnp.bfloat16)


t = per_iter_ms(mm, a)
flops = 2 * 8192**3
log("matmul_8192_bf16", {"ms": t, "tflops": flops / t / 1e9})

# ---- plain conv at encoder stage-1 shape ----
x1 = jax.device_put(
    np.random.rand(B, 184, 320, 64).astype(np.float32)
).astype(jnp.bfloat16)
w1 = jax.device_put(np.random.rand(3, 3, 64, 64).astype(np.float32)).astype(
    jnp.bfloat16
)


def conv3(x):
    return jax.lax.conv_general_dilated(
        x, w1, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


t = per_iter_ms(conv3, x1)
flops = 2 * B * 184 * 320 * 9 * 64 * 64
log("conv3x3_64_184x320", {"ms": t, "ms_per_frame": t / B,
                           "tflops": flops / t / 1e9})

# ---- instance norm alone at the same shape ----
def inorm(x):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(1, 2), keepdims=True)
    v = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)


t = per_iter_ms(inorm, x1)
log("instance_norm_184x320x64", {"ms": t, "ms_per_frame": t / B})

# ---- stem conv: 7x7 s2 on 3 channels ----
x0 = jax.device_put(
    np.random.rand(B, H, W, 3).astype(np.float32)
).astype(jnp.bfloat16)
w0 = jax.device_put(np.random.rand(7, 7, 3, 64).astype(np.float32)).astype(
    jnp.bfloat16
)


def stem(x):
    return jax.lax.conv_general_dilated(
        x, w0, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


t = per_iter_ms(stem, x0)
flops = 2 * B * 184 * 320 * 49 * 3 * 64
log("stem7x7s2_3to64", {"ms": t, "ms_per_frame": t / B,
                        "tflops": flops / t / 1e9})

# ---- full encoder passes ----
ckpt = "checkpoints/demo_raft.ckpt"
runner = RaftRunner(
    iters=4, checkpoint_path=ckpt if os.path.exists(ckpt) else None
)
model = runner.model
variables = runner.variables

xf = jax.device_put(np.random.rand(B, H, W, 3).astype(np.float32)) * 2 - 1


def fnet(x):
    return model.apply(
        variables, x, train=False,
        method=lambda m, x, train: m.fnet(x, train=train),
    )


t = per_iter_ms(fnet, xf)
log("fnet_368x640", {"ms": t, "ms_per_frame": t / B})


def cnet(x):
    return model.apply(
        variables, x, train=False,
        method=lambda m, x, train: m.cnet(x, train=train),
    )


t = per_iter_ms(cnet, xf)
log("cnet_368x640", {"ms": t, "ms_per_frame": t / B})

# ---- one update-block iteration, in-dispatch ----
h8, w8 = H // 8, W // 8
rng = np.random.RandomState(0)
hidden = jax.device_put(rng.rand(B, h8, w8, 128).astype(np.float32))
context = jax.device_put(rng.rand(B, h8, w8, 128).astype(np.float32))
corr = jax.device_put(rng.rand(B, h8, w8, 324).astype(np.float32))
flow0 = jax.device_put(rng.rand(B, h8, w8, 2).astype(np.float32))


def upd(h):
    nh, d, m = model.apply(
        variables, h, context, corr, flow0,
        method=lambda mm, a, b, c, d: mm.update_block(a, b, c, d),
    )
    return nh


t = per_iter_ms(upd, hidden)
log("update_block_1it", {"ms": t, "ms_per_frame": t / B})

# ---- update-block decomposition (motion encoder / GRU / heads) ----
motion_in = jax.device_put(rng.rand(B, h8, w8, 128).astype(np.float32))
gru_x = jax.device_put(rng.rand(B, h8, w8, 256).astype(np.float32))


def menc(f):
    return model.apply(
        variables, f, corr,
        method=lambda mm, a, b: mm.update_block.encoder(a, b),
    )


t = per_iter_ms(menc, flow0)
log("upd_motion_encoder", {"ms": t, "ms_per_frame": t / B})


def gru(h):
    return model.apply(
        variables, h, gru_x,
        method=lambda mm, a, b: mm.update_block.gru(a, b),
    )


t = per_iter_ms(gru, hidden)
log("upd_gru", {"ms": t, "ms_per_frame": t / B})


def heads(h):
    return model.apply(
        variables, h,
        method=lambda mm, a: mm.update_block.flow_head(a)
        + 0.0 * mm.update_block.mask_head(a)[..., :2],
    )


t = per_iter_ms(heads, hidden)
log("upd_flow_mask_heads", {"ms": t, "ms_per_frame": t / B})

# ---- fused update block (fast_update.py exact conv fusions) A/B ----
from rdvc_tpu.models.raft.fast_update import fused_update_step
from rdvc_tpu.models.raft.raft import RAFT

upd_params = variables["params"]["update_block"]


def upd_fused(h):
    nh, d, m = fused_update_step(upd_params, h, context, corr, flow0)
    return nh


t = per_iter_ms(upd_fused, hidden)
log("update_block_1it_fused", {"ms": t, "ms_per_frame": t / B})


def raft4_fused(x):
    m4 = RAFT(iters=4, fused_update=True)
    return m4.apply(variables, x, x, train=False)


def raft4_flax(x):
    m4 = RAFT(iters=4, fused_update=False)
    return m4.apply(variables, x, x, train=False)


t = per_iter_ms(raft4_fused, xf)
log("raft4_fused_368x640", {"ms": t, "ms_per_frame": t / B})
t = per_iter_ms(raft4_flax, xf)
log("raft4_flax_368x640", {"ms": t, "ms_per_frame": t / B})

# ---- corr lookup alone (pyramid held loop-invariant, coords perturbed) ----
from rdvc_tpu.models.raft.corr import build_corr_pyramid, corr_lookup

fm1 = jax.device_put(rng.rand(B, h8, w8, 256).astype(np.float32)).astype(
    jnp.bfloat16
)
fm2 = jax.device_put(rng.rand(B, h8, w8, 256).astype(np.float32)).astype(
    jnp.bfloat16
)
pyr = build_corr_pyramid(fm1, fm2, 4)
coords = jax.device_put(
    (rng.rand(B, h8, w8, 2) * 8).astype(np.float32)
)


def lookup(c):
    return corr_lookup(pyr, c, 4)


t = per_iter_ms(lookup, coords)
log("upd_corr_lookup", {"ms": t, "ms_per_frame": t / B})

print(json.dumps(report))
