"""Per-layer device-time attribution inside the codec transforms.

profile_stages.py says enc_analysis_1080p costs 133 ms/frame while its conv
micro-benchmarks (ab_conv.py) sum to ~22 ms/frame — this script finds the
missing 110 ms by timing cumulative prefixes of the analysis stack and
A/B-ing the inference-norm handling (BatchNorm folded into conv weights vs
the f32 scale/shift layer).

Run on the real TPU:  python scripts/profile_layers.py [out.json]
"""

import json
import os
import sys

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax

if _os.environ.get("PROF_CPU"):  # axon ignores JAX_PLATFORMS; force via config
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

np.asarray(jax.device_put(np.zeros(8, np.uint8)))  # absorb relay handshake

from rdvc_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.models.codec import VideoCodec
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
from rdvc_tpu.utils.profiling import compiled_cost, mfu, time_device

B = int(os.environ.get("PROF_B", "8"))
ITERS = int(os.environ.get("PROF_ITERS", "3"))
H = int(os.environ.get("PROF_H", "1080"))
W = int(os.environ.get("PROF_W", "1920"))

report = {"B": B, "iters": ITERS}


def log(k, v):
    report[k] = v
    print(f"{k}: {json.dumps(v)}", flush=True)


ckpt = "checkpoints/demo_synthetic.ckpt"
runtime = CodecRuntime(
    model_cfg=CodecConfig().model_config(),
    checkpoint_path=ckpt if os.path.exists(ckpt) else None,
)
variables = runtime.variables

rng = np.random.RandomState(0)
residual = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
flow = jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32) * 4.0)


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t = time_device(lambda: fn_j(*args), ITERS)
    try:
        c = compiled_cost(fn_j, *args)
        log(name, {
            "ms_per_frame": round(t / B * 1e3, 2),
            "flops_per_frame": c["flops"] / B,
            "mfu": round(mfu(c["flops"], t), 4),
        })
    except Exception:
        log(name, {"ms_per_frame": round(t / B * 1e3, 2)})
    return out


# -------- full analyses, one at a time --------
timed("analyze_residual", lambda v, x: runtime._apply(
    v, x, method=VideoCodec.analyze_residual), variables, residual)
timed("analyze_motion", lambda v, x: runtime._apply(
    v, x, method=VideoCodec.analyze_motion), variables, flow)


# -------- cumulative prefixes of the residual analysis stack --------
# Mirrors AnalysisTransform: stem k5s1 -> 3 x (k3s2 ConvNormAct) ->
# 2 x ResidualBlock -> latent conv. Uses the real trained params by
# binding the submodule stack directly.
from rdvc_tpu.models.transforms import AnalysisTransform

at = AnalysisTransform()
at_params = None


def _find_analysis_params(variables):
    p = variables["params"]
    for k in p:
        if k == "residual_encoder":
            return {"params": p[k]}, k
    return None, None


at_vars, at_key = _find_analysis_params(variables)
log("analysis_param_key", at_key)

if at_vars is not None:
    bs = variables.get("batch_stats")
    if bs is not None and at_key in bs:
        at_vars = dict(at_vars)
        at_vars["batch_stats"] = bs[at_key]

    def prefix_fn(n_layers):
        def f(v, x):
            return at.apply(
                v, x, train=False,
                method=lambda m, x, train: _prefix(m, x, n_layers),
            )
        return f

    from rdvc_tpu.models.layers import (
        Conv, ConvNormAct, ResidualBlock, get_activation,
    )

    def _prefix(m, x, n):
        x = x.astype(m.compute_dtype)
        i = 0
        x = ConvNormAct(
            m.base_channels, kernel_size=5, stride=1,
            norm=m.norm, act=m.act, compute_dtype=m.compute_dtype,
        )(x, train=False)
        i += 1
        if i >= n:
            return x
        ch = m.base_channels
        for _ in range(m.num_downsample_layers):
            ch *= 2
            x = ConvNormAct(
                ch, kernel_size=3, stride=2,
                norm=m.norm, act=m.act, compute_dtype=m.compute_dtype,
            )(x, train=False)
            i += 1
            if i >= n:
                return x
        for _ in range(m.num_res_blocks):
            x = ResidualBlock(
                ch, norm=m.norm, act=m.act, compute_dtype=m.compute_dtype
            )(x, train=False)
            i += 1
            if i >= n:
                return x
        x = Conv(
            m.latent_channels, kernel_size=3, stride=1,
            compute_dtype=m.compute_dtype, out_dtype=jnp.float32,
        )(x)
        return x

    for n in range(1, 8):
        try:
            timed("residual_prefix_%d" % n, prefix_fn(n), at_vars, residual)
        except Exception as e:
            log("residual_prefix_%d" % n, {"error": str(e)[:200]})
            break

out_path = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/profile_layers.json"
os.makedirs(os.path.dirname(out_path), exist_ok=True)
with open(out_path, "w") as f:
    json.dump(report, f, indent=2)
print("wrote", out_path)
