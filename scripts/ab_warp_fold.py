"""A/B on the real chip: tiled one-hot warp vs flat gather, and BN-folded
vs raw-norm transforms, isolated and end-to-end (encode chain/decode scan).

Run:  python scripts/ab_warp_fold.py [out.json]
(RDVC_WARP / RDVC_FOLD_BN are read at trace time, so each arm builds its
own CodecRuntime and jits fresh functions.)
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

from rdvc_tpu.utils.profiling import time_device

B = int(os.environ.get("PROF_B", "8"))
ITERS = int(os.environ.get("PROF_ITERS", "3"))
H, W = 1080, 1920

report = {"B": B}


def log(k, v):
    report[k] = v
    print(f"{k}: {json.dumps(v)}", flush=True)


rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
flow = jnp.asarray((rng.randn(B, H, W, 2) * 6).astype(np.float32))

# ---------------- warp A/B ----------------
from rdvc_tpu.ops.warp import bilinear_warp
from rdvc_tpu.ops.warp_tiled import bilinear_warp_tiled


@jax.jit
def w_flat(i, f):
    return bilinear_warp(i, f, impl="flat")


@jax.jit
def w_tiled(i, f):
    return bilinear_warp_tiled(i, f)


a = np.asarray(w_flat(img, flow))
b = np.asarray(w_tiled(img, flow))
log("warp_max_abs_diff", float(np.max(np.abs(a - b))))
t = time_device(lambda: w_flat(img, flow), ITERS)
log("warp_flat", {"ms_per_frame": round(t / B * 1e3, 2)})
t = time_device(lambda: w_tiled(img, flow), ITERS)
log("warp_tiled", {"ms_per_frame": round(t / B * 1e3, 2)})

# ---------------- fold + e2e A/B ----------------
from rdvc_tpu.config import CodecConfig
from rdvc_tpu.models.codec import VideoCodec
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

ckpt = "checkpoints/demo_synthetic.ckpt"
residual = jnp.asarray((rng.randn(B, H, W, 3) * 0.1).astype(np.float32))

for fold, warp_impl in (("1", "tiled"), ("1", "flat"), ("0", "tiled")):
    os.environ["RDVC_FOLD_BN"] = fold
    os.environ["RDVC_WARP"] = warp_impl
    rt = CodecRuntime(
        model_cfg=CodecConfig().model_config(),
        checkpoint_path=ckpt if os.path.exists(ckpt) else None,
    )
    tag = ("folded" if fold == "1" else "raw") + "_" + warp_impl

    @jax.jit
    def analysis(v, r, f):
        m = rt._apply(v, f, method=VideoCodec.analyze_motion)
        rr = rt._apply(v, r, method=VideoCodec.analyze_residual)
        return m, rr

    analysis(rt.variables, residual, flow)
    t = time_device(lambda: analysis(rt.variables, residual, flow), ITERS)
    log(f"analysis_{tag}", {"ms_per_frame": round(t / B * 1e3, 2)})

    # decode scan, bench shape (T=8, G=2)
    G, T = 2, 8
    mshape = (T, G, H // 8, W // 8, rt.cfg.motion_latent_channels)
    rshape = (T, G, H // 8, W // 8, rt.cfg.residual_latent_channels)
    mT = jnp.asarray(rng.randint(-3, 4, mshape).astype(np.int16))
    rT = jnp.asarray(rng.randint(-3, 4, rshape).astype(np.int16))
    state = img[:G]
    sargs = (
        rt.variables, state, state, state, mT, rT,
        jnp.float32(0.0), jnp.float32(0.0), (H, W), True,
    )
    rt._scan_decode_fn(*sargs)
    t = time_device(lambda: rt._scan_decode_fn(*sargs), ITERS)
    log(f"decode_scan_{tag}", {"ms_per_frame": round(t / (T * G) * 1e3, 2)})

out_path = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/ab_warp_fold.json"
os.makedirs(os.path.dirname(out_path), exist_ok=True)
with open(out_path, "w") as f:
    json.dump(report, f, indent=2)
print("wrote", out_path)
