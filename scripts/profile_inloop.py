"""In-graph stage attribution: fori_loop K vs 2K differences.

Round-4 measurement lesson (benchmarks/profile_raft.json vs
profile_stages_r04.json): ISOLATED stage dispatches through the axon relay
are unreliable even with min-of-trials fencing — the same stage reads 2x
apart across runs (update block 36.8 vs 74.4 ms) because each dispatch pays
a variable relay round trip that scales with argument count. The only
attribution that survives the link is an IN-GRAPH difference: run the stage
K times inside one jitted fori_loop, time at K and 2K, and divide the
difference — dispatch cost, fence cost, and argument shipping cancel
exactly. (This method is how the GRU update block's real marginal cost was
pinned at 6.9 ms/frame/iter when its isolated reads said 37-74.)

Every stage's loop body folds a reduction of the outputs back into ALL of
its inputs (x + sum(y)*0) so XLA can neither dead-code the stage nor hoist
input-dependent subexpressions (e.g. warp's index math from a constant
flow) out of the loop.

Run on an IDLE real TPU:  python scripts/profile_inloop.py [out.json]
Env: PROF_B (default 4), PROF_K (default 8; 2K must fit wall budget).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jax.device_put(np.zeros(8, np.uint8)))  # absorb relay handshake

from rdvc_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

from rdvc_tpu.utils.profiling import device_fence

B = int(os.environ.get("PROF_B", "4"))
K = int(os.environ.get("PROF_K", "8"))
OUT = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/profile_inloop.json"
report = {"B": B, "K": K, "device": str(jax.devices()[0])}


def log(name, val):
    report[name] = val
    print(name, json.dumps(val), flush=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)


def _perturb(inputs, y):
    """Fold a zero-valued, data-dependent scalar into every input leaf
    (floating AND integer — all-integer stages would otherwise be
    loop-invariant and hoistable)."""
    s = jnp.sum(y.astype(jnp.float32)) * jnp.float32(0.0)
    def add(a):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a + s.astype(a.dtype)
        if jnp.issubdtype(a.dtype, jnp.integer):
            return a + s.astype(jnp.int32).astype(a.dtype)
        return a
    return jax.tree_util.tree_map(add, inputs)


def inloop_ms_per_frame(name, fn, inputs, frames_per_call=None):
    """Per-frame ms of fn(*inputs) via the K vs 2K in-loop difference."""
    fpc = B if frames_per_call is None else frames_per_call

    @jax.jit
    def run(n, inputs):
        def body(_, ins):
            y = fn(*ins)
            leaf = next(
                l for l in jax.tree_util.tree_leaves(y)
                if hasattr(l, "dtype")
            )
            return _perturb(ins, leaf)

        return jax.lax.fori_loop(0, n, body, inputs)

    n1 = jnp.int32(K)
    n2 = jnp.int32(2 * K)
    out = run(n1, inputs)
    device_fence(out)  # compile + drain

    def timed(n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            device_fence(run(n, inputs))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(n1)
    t2 = timed(n2)
    ms = (t2 - t1) / K / fpc * 1e3
    log(name, {"ms_per_frame": ms, "t_K_s": t1, "t_2K_s": t2})
    return ms


rng = np.random.RandomState(0)


def f32(*shape):
    return jax.device_put(rng.rand(*shape).astype(np.float32))


# ---------------------------------------------------------------- RAFT
from rdvc_tpu.models.raft import RaftRunner

ckpt = "checkpoints/demo_raft.ckpt"
runner = RaftRunner(
    iters=4, checkpoint_path=ckpt if os.path.exists(ckpt) else None
)
model, variables = runner.model, runner.variables
RH, RW = 368, 640
a = f32(B, RH, RW, 3)

fnet = lambda x: model.apply(
    variables, x, train=False,
    method=lambda m, x, train: m.fnet(x, train=train),
)
inloop_ms_per_frame("raft_fnet", fnet, (a,))

cnet = lambda x: model.apply(
    variables, x, train=False,
    method=lambda m, x, train: m.cnet(x, train=train),
)
inloop_ms_per_frame("raft_cnet", cnet, (a,))

# Encoder stem alone (the lane-hostile 7x7 s2 3->64 conv + norm):
# measured against the full fnet to locate the pathology.
fparams = variables["params"]["fnet"]
fbs = (variables.get("batch_stats") or {}).get("fnet", {})
stem_k = jnp.asarray(fparams["Conv_0"]["kernel"], jnp.bfloat16)
stem_b = jnp.asarray(fparams["Conv_0"]["bias"], jnp.bfloat16)


def stem_only(x):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem_k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + stem_b
    return jax.nn.relu(y)


inloop_ms_per_frame("raft_stem_conv_only", stem_only, (a,))

# ---------------------------------------------------------------- codec
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

rt = CodecRuntime(
    checkpoint_path=(
        "checkpoints/demo_synthetic.ckpt"
        if os.path.exists("checkpoints/demo_synthetic.ckpt") else None
    )
)
H, W = 1080, 1920
img = f32(B, H, W, 3)
flow = jax.device_put(
    (rng.rand(B, H, W, 2).astype(np.float32) - 0.5) * 8.0
)

from rdvc_tpu.ops.warp import bilinear_warp

inloop_ms_per_frame(
    "warp_tiled_1080p", lambda i, f: bilinear_warp(i, f, impl="tiled"),
    (img, flow),
)
inloop_ms_per_frame(
    "warp_planar_1080p", lambda i, f: bilinear_warp(i, f, impl="planar"),
    (img, flow),
)
inloop_ms_per_frame(
    "warp_flat_1080p", lambda i, f: bilinear_warp(i, f, impl="flat"),
    (img, flow),
)

# MCN at 1080p (fast s2d graph, as the decode path runs it)
fast = rt.variables.get("fast")
if fast is not None:
    from rdvc_tpu.models import fast_infer as fi
    from rdvc_tpu.models.layers import get_activation

    act = get_activation(rt.cfg.activation)
    inloop_ms_per_frame(
        "mcn_1080p",
        lambda w, f, r: fi.mcn_apply(
            fast["mcn"], w, f, r, act, jnp.bfloat16
        ),
        (img, flow, img),
    )

    # Synthesis (residual decoder) at 1080p comp-res latents
    hl, wl = H // 8, W // 8
    q_r = f32(B, hl, wl, rt.cfg.residual_latent_channels)
    inloop_ms_per_frame(
        "synthesis_residual_1080p",
        lambda q: fi.synthesis_apply(
            fast["residual_decoder"], q, act, jnp.bfloat16
        ),
        (q_r,),
    )
    q_m = f32(B, hl, wl, rt.cfg.motion_latent_channels)
    inloop_ms_per_frame(
        "synthesis_motion_1080p",
        lambda q: fi.synthesis_apply(
            fast["motion_decoder"], q, act, jnp.bfloat16,
        ),
        (q_m,),
    )

from rdvc_tpu.postproc.histmatch import histogram_match_ycrcb

inloop_ms_per_frame(
    "histmatch_1080p", histogram_match_ycrcb, (img, f32(B, H, W, 3)),
)

# -------------------------------------------------- device entropy kernels
# Decode cost is data-independent (comparison-sums + masked selects; no
# data-dependent control flow), so random word grids time the real kernel.
from rdvc_tpu.entropy.device_rans import (
    DeviceRansDecoder,
    _bucket,
    _decode_ca_batch_kernel,
    ca_layout,
)

hl, wl = H // 8, W // 8
hw = hl * wl
for name, channels, tables in (
    ("dev_rans_dec_motion", rt.cfg.motion_latent_channels,
     rt.motion_tables),
    ("dev_rans_dec_residual", rt.cfg.residual_latent_channels,
     rt.residual_tables),
):
    K, S, L = ca_layout(channels, hw)
    rows, offs_s, _K = DeviceRansDecoder(tables)._ca_rows(S)
    Wmax = _bucket(L // 2 + 2)
    grid = jax.device_put(
        rng.randint(0, 1 << 16, (B, Wmax, S)).astype(np.uint16)
    )

    def _dec(g, r, o, K=K, L=L):
        return _decode_ca_batch_kernel(g, r, o, K, L, hw)

    inloop_ms_per_frame(name, _dec, (grid, rows, offs_s))

# Hyperprior Gaussian-conditional decode kernel (tag 0x05) at the 1080p
# comp-res y-latent size — the VERDICT-r3 "skipped: host transport" row.
# Decode cost is data-independent, so random word grids + random scale
# bins time the real kernel.
from rdvc_tpu.entropy.device_gaussian import (
    DEFAULT_BINS,
    _decode_bin_batch_kernel,
    bin_stream_layout,
    device_gaussian_rows,
)
from rdvc_tpu.entropy.gaussian import build_gaussian_cdf_tables

gt = build_gaussian_cdf_tables()
_, _, cdfp, _, offs_g = device_gaussian_rows(gt, DEFAULT_BINS)
n_y = hw * rt.cfg.residual_latent_channels
Sg, Lg = bin_stream_layout(n_y)
Bg = 2
grid_g = jax.device_put(
    rng.randint(0, 1 << 16, (Bg, _bucket(Lg // 2 + 2), Sg)).astype(np.uint16)
)
bins_g = jax.device_put(
    rng.randint(0, DEFAULT_BINS, (Bg, n_y)).astype(np.int32)
)


def _dec_gauss(g, b):
    return _decode_bin_batch_kernel(g, b, cdfp, offs_g, Sg, Lg, n_y)


inloop_ms_per_frame(
    "dev_gauss_dec_residual_y", _dec_gauss, (grid_g, bins_g),
    frames_per_call=Bg,
)

print(json.dumps(report))
