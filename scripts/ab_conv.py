"""A/B: XLA native conv vs mmconv on the real chip, micro + end-to-end.

Also re-times the round-3 gather fixes (warp quad-gather, histmatch
one-hot LUT, rANS decode one-hot fetch). One JSON doc; no process kills.

Run:  python scripts/ab_conv.py [out.json]
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

from rdvc_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

from rdvc_tpu.ops.mmconv import conv2d_mm, conv_transpose2d_mm
from rdvc_tpu.utils.profiling import compiled_cost, mfu, time_device

report = {}


def log(k, v):
    report[k] = v
    print(f"{k}: {json.dumps(v)}", flush=True)


ITERS = 3
rng = np.random.RandomState(0)

# ---------------- conv micro A/B ----------------
SHAPES = [
    ("stem5x5_3to64_1080p", (8, 1080, 1920, 3), (5, 5, 3, 64), 1),
    ("mid3x3s2_64to128_540p", (8, 540, 960, 64), (3, 3, 64, 128), 2),
    ("res3x3_128_270p", (8, 270, 480, 128), (3, 3, 128, 128), 1),
    ("mcn5x5_8to32_1080p", (8, 1080, 1920, 8), (5, 5, 8, 32), 1),
    ("mcn3x3_32_1080p", (8, 1080, 1920, 32), (3, 3, 32, 32), 1),
]
for name, xs, ws, s in SHAPES:
    x = jnp.asarray(rng.randn(*xs).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.randn(*ws) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)
    pad = ws[0] // 2
    fl = (
        (xs[1] // s) * (xs[2] // s) * xs[0]
        * ws[0] * ws[1] * ws[2] * ws[3] * 2
    )

    # Outputs are reduced to a scalar INSIDE the jit: queued iterations
    # would otherwise hold N multi-GB output buffers at once (OOM), and
    # both variants pay the same reduction pass.
    @jax.jit
    def f_xla(x, w, s=s, pad=pad):
        return jnp.sum(
            jax.lax.conv_general_dilated(
                x, w, window_strides=(s, s),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
        )

    @jax.jit
    def f_mm(x, w, s=s, pad=pad):
        return jnp.sum(conv2d_mm(x, w, stride=(s, s), padding=(pad, pad)))

    f_xla(x, w)
    t_xla = time_device(lambda: f_xla(x, w), ITERS)
    f_mm(x, w)
    t_mm = time_device(lambda: f_mm(x, w), ITERS)
    log(name, {
        "xla_ms": round(t_xla * 1e3, 2), "mm_ms": round(t_mm * 1e3, 2),
        "xla_mfu": round(mfu(fl, t_xla), 4),
        "mm_mfu": round(mfu(fl, t_mm), 4),
        "speedup": round(t_xla / t_mm, 2),
    })

# transpose conv A/B (synthesis path shape)
x = jnp.asarray(rng.randn(8, 135, 240, 192).astype(np.float32)).astype(
    jnp.bfloat16
)
w = jnp.asarray((rng.randn(3, 3, 192, 256) * 0.05).astype(np.float32)).astype(
    jnp.bfloat16
)


@jax.jit
def t_xla_fn(x, w):
    return jnp.sum(
        jax.lax.conv_transpose(
            x, w, strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    )


@jax.jit
def t_mm_fn(x, w):
    return jnp.sum(conv_transpose2d_mm(x, w))


t_xla_fn(x, w)
t1 = time_device(lambda: t_xla_fn(x, w), ITERS)
t_mm_fn(x, w)
t2 = time_device(lambda: t_mm_fn(x, w), ITERS)
fl = 8 * 270 * 480 * 9 * 192 * 256 * 2
log("convT3x3s2_192to256_135to270", {
    "xla_ms": round(t1 * 1e3, 2), "mm_ms": round(t2 * 1e3, 2),
    "xla_mfu": round(mfu(fl, t1), 4), "mm_mfu": round(mfu(fl, t2), 4),
    "speedup": round(t1 / t2, 2),
})

# ---------------- end-to-end A/B ----------------
from rdvc_tpu.config import CodecConfig
from rdvc_tpu.eval.clips import coherent_clip
from rdvc_tpu.io.yuv import rgb_to_yuv420p
from rdvc_tpu.models.raft import RaftRunner
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

B = 8
H, W = 1080, 1920
frames = coherent_clip(B + 1, H, W, seed=0)
chain = np.stack([rgb_to_yuv420p(f) for f in frames])
chain_dev = jax.device_put(chain)
ckpt = "checkpoints/demo_synthetic.ckpt"

for impl in ("xla", "mm"):
    os.environ["RDVC_CONV_IMPL"] = impl
    runtime = CodecRuntime(
        model_cfg=CodecConfig().model_config(),
        checkpoint_path=ckpt if os.path.exists(ckpt) else None,
    )
    runner = RaftRunner(iters=12, checkpoint_path="checkpoints/demo_raft.ckpt")
    runtime.attach_raft(runner.model, runner.variables)
    enc_args = (
        runtime.variables, runner.variables, chain_dev,
        (368, 640), (1080, 1920), (1080, 1920),
    )
    enc_fn = runtime._fused_encode_chain_i420_fn
    m_sym, r_sym = enc_fn(*enc_args)
    t_enc = time_device(lambda: enc_fn(*enc_args), ITERS)
    c_enc = compiled_cost(enc_fn, *enc_args)

    T, G = 8, 2
    m_np, r_np = np.asarray(m_sym), np.asarray(r_sym)
    mT = jnp.asarray(np.repeat(m_np[:T][:, None], G, 1))
    rT = jnp.asarray(np.repeat(r_np[:T][:, None], G, 1))
    state = jnp.asarray(
        np.stack([frames[0].astype(np.float32) / 255.0] * G)
    )
    scan_args = (
        runtime.variables, state, state, state, mT, rT,
        jnp.float32(0.0), jnp.float32(0.0), (H, W), True,
    )
    runtime._scan_decode_fn(*scan_args)
    t_dec = time_device(lambda: runtime._scan_decode_fn(*scan_args), ITERS)
    log(f"e2e_{impl}", {
        "encode_ms_per_frame": round(t_enc / B * 1e3, 1),
        "encode_mfu": round(mfu(c_enc["flops"], t_enc), 4),
        "decode_scan_ms_per_frame": round(t_dec / (T * G) * 1e3, 1),
    })

    if impl == "mm":
        # re-time the fixed kernels under the final impl
        from rdvc_tpu.ops.warp import bilinear_warp
        from rdvc_tpu.postproc import histogram_match_ycrcb

        prev = jnp.asarray(
            np.stack([f.astype(np.float32) / 255.0 for f in frames[:B]])
        )
        flow = jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32) * 5)

        wf = jax.jit(bilinear_warp)
        wf(prev, flow)
        t = time_device(lambda: wf(prev, flow), ITERS)
        log("warp_quad_1080p", {"ms_per_frame": round(t / B * 1e3, 1)})

        hf = jax.jit(histogram_match_ycrcb)
        hf(state, state)
        t = time_device(lambda: hf(state, state), ITERS)
        log("histmatch_onehot_1080p", {"ms_per_frame": round(t / G * 1e3, 1)})

        handles = runtime.encode_frames_device_rans(m_sym, r_sym)
        rows = runtime.assemble_frames(handles, B)
        pm = [p[0] for p in rows]
        pr = [p[2] for p in rows]
        if all(p is not None and p[0] == 0x03 for p in pm + pr):
            shape_m = (m_sym.shape[1], m_sym.shape[2])
            shape_r = (r_sym.shape[1], r_sym.shape[2])
            runtime.decode_payloads_device(pm, "motion", shape_m)
            t = time_device(
                lambda: (
                    runtime.decode_payloads_device(pm, "motion", shape_m),
                    runtime.decode_payloads_device(pr, "residual", shape_r),
                ),
                ITERS,
            )
            log("device_rans_decode_onehot", {
                "ms_per_frame": round(t / B * 1e3, 1)
            })

out_path = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/ab_conv.json"
os.makedirs(os.path.dirname(out_path), exist_ok=True)
with open(out_path, "w") as f:
    json.dump(report, f, indent=2)
print("wrote", out_path)
