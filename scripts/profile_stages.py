"""Isolated device-time profile of every codec stage (VERDICT r2 item #1).

Runs each hot piece N times on the real TPU with a single few-byte fence
(utils/profiling.py), so numbers are DEVICE compute — not relay queue wait
— plus measured link bandwidth and host-coder time. Prints one JSON doc.

Usage:  python scripts/profile_stages.py [out.json]
Env:    PROF_B (encode batch, default 8), PROF_ITERS (default 3)
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

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.eval.clips import coherent_clip
from rdvc_tpu.io.yuv import rgb_to_yuv420p
from rdvc_tpu.models.raft import RaftRunner
from rdvc_tpu.ops.resize import resize_bilinear, resize_flow
from rdvc_tpu.ops.warp import bilinear_warp
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
from rdvc_tpu.postproc import histogram_match_ycrcb
from rdvc_tpu.utils.profiling import (
    compiled_cost,
    dispatch_floor,
    fence_overhead,
    mfu,
    time_device,
    time_transfer_down,
    time_transfer_up,
)

B = int(os.environ.get("PROF_B", "8"))
ITERS = int(os.environ.get("PROF_ITERS", "3"))
# PROF_H/PROF_W: CPU smoke at tiny shapes (default = the real 1080p target)
H = int(os.environ.get("PROF_H", "1080"))
W = int(os.environ.get("PROF_W", "1920"))
RAFT_HW = (368, 640) if H >= 368 else (max(32, H // 2), max(64, W // 2))
COMP_HW = (H, W)

report = {"B": B, "iters": ITERS, "device": str(jax.devices()[0])}

OUT_PATH = (
    sys.argv[1] if len(sys.argv) > 1 else "benchmarks/profile_stages.json"
)
os.makedirs(os.path.dirname(OUT_PATH) or ".", exist_ok=True)


def log(k, v):
    report[k] = v
    print(f"{k}: {json.dumps(v)}", flush=True)
    # Incremental dump: partial results survive a suite-level timeout.
    with open(OUT_PATH, "w") as f:
        json.dump(report, f, indent=2)


ckpt = "checkpoints/demo_synthetic.ckpt"
runtime = CodecRuntime(
    model_cfg=CodecConfig().model_config(),
    checkpoint_path=ckpt if os.path.exists(ckpt) else None,
)
RAFT_ITERS = CodecConfig().raft_iters
runner = RaftRunner(
    iters=RAFT_ITERS, checkpoint_path="checkpoints/demo_raft.ckpt"
)
runtime.attach_raft(runner.model, runner.variables)

frames = coherent_clip(B + 1, H, W, seed=0)
chain_i420 = np.stack([rgb_to_yuv420p(f) for f in frames])  # (B+1, H*1.5, W)
chain_dev = jax.device_put(chain_i420)

# ---------------- link calibration ----------------
# Stages whose device time is below dispatch_floor_s measure the relay
# dispatch round trip, not the kernel: treat them as upper bounds.
log("fence_overhead_s", fence_overhead(3))
log("dispatch_floor_s", dispatch_floor(5))
log("up_link", time_transfer_up(chain_i420))
log("down_link", time_transfer_down(chain_dev))

# ---------------- full fused encode ----------------
enc_args = (
    runtime.variables, runner.variables, chain_dev,
    RAFT_HW, COMP_HW, COMP_HW,
)
enc_fn = runtime._fused_encode_chain_i420_fn
m_sym, r_sym = enc_fn(*enc_args)
t = time_device(lambda: enc_fn(*enc_args), ITERS)
cost = compiled_cost(enc_fn, *enc_args)
log("encode_chain", {
    "s_per_dispatch": t, "ms_per_frame": t / B * 1e3,
    "flops_per_frame": cost["flops"] / B, "bytes": cost["bytes"],
    "mfu": mfu(cost["flops"], t),
})

# ---------------- encode sub-pieces ----------------
rgb = runtime._i420_to_rgb_traced(jnp.asarray(chain_dev))
prev_u8, cur_u8 = rgb[:-1], rgb[1:]
prev = prev_u8.astype(jnp.float32) / 255.0
cur = cur_u8.astype(jnp.float32) / 255.0


@jax.jit
def piece_pre(chain):
    rgb = runtime._i420_to_rgb_traced(chain)
    prev = rgb[:-1].astype(jnp.float32) / 255.0
    cur = rgb[1:].astype(jnp.float32) / 255.0
    return resize_bilinear(prev, RAFT_HW), resize_bilinear(cur, RAFT_HW)


p_small, c_small = piece_pre(chain_dev)
t = time_device(lambda: piece_pre(chain_dev), ITERS)
c = compiled_cost(piece_pre, chain_dev)
log("enc_pre_i420_resize", {"ms_per_frame": t / B * 1e3,
                            "flops_per_frame": c["flops"] / B,
                            "mfu": mfu(c["flops"], t)})


@jax.jit
def piece_raft(rv, a, b):
    return runner.model.apply(rv, a, b, train=False)


flow_small = piece_raft(runner.variables, p_small, c_small)
t = time_device(lambda: piece_raft(runner.variables, p_small, c_small), ITERS)
c = compiled_cost(piece_raft, runner.variables, p_small, c_small)
log(f"enc_raft_368x640_{RAFT_ITERS}it", {"ms_per_frame": t / B * 1e3,
                                         "flops_per_frame": c["flops"] / B,
                                         "mfu": mfu(c["flops"], t)})

# Reference-parity iteration count for the A/B record (raft_iters_study.json
# holds the RD/EPE evidence that the default is quality-neutral).
if RAFT_ITERS != 12:
    runner12 = RaftRunner(
        iters=12, checkpoint_path="checkpoints/demo_raft.ckpt"
    )

    @jax.jit
    def piece_raft12(rv, a, b):
        return runner12.model.apply(rv, a, b, train=False)

    piece_raft12(runner12.variables, p_small, c_small)
    t = time_device(
        lambda: piece_raft12(runner12.variables, p_small, c_small), ITERS
    )
    c = compiled_cost(piece_raft12, runner12.variables, p_small, c_small)
    log("enc_raft_368x640_12it", {"ms_per_frame": t / B * 1e3,
                                  "flops_per_frame": c["flops"] / B,
                                  "mfu": mfu(c["flops"], t)})

# ---------------- RAFT sub-stage attribution ----------------
# Where do the RAFT milliseconds go: encoders vs corr volume vs per-
# iteration lookup+update vs upsample. Guides kernel work (e.g. whether
# the fused Pallas corr kernel or a fused GRU would pay).
try:
    rm = runner.model
    rv = runner.variables

    @jax.jit
    def raft_encoders(v, a, b):
        x1 = a.astype(jnp.float32) * 2.0 - 1.0
        x2 = b.astype(jnp.float32) * 2.0 - 1.0

        def run(m, x1, x2):
            return (
                m.fnet(x1, train=False),
                m.fnet(x2, train=False),
                m.cnet(x1, train=False),
            )

        return rm.apply(v, x1, x2, method=run)

    f1, f2, cf = raft_encoders(rv, p_small, c_small)
    t = time_device(lambda: raft_encoders(rv, p_small, c_small), ITERS)
    log("raft_encoders", {"ms_per_frame": t / B * 1e3})

    from rdvc_tpu.models.raft.corr import build_corr_pyramid, corr_lookup

    @functools.partial(jax.jit, static_argnames=("use_pallas",))
    def raft_pyramid(f1, f2, use_pallas=False):
        return build_corr_pyramid(f1, f2, 4, use_pallas=use_pallas)

    pyr = raft_pyramid(f1, f2)
    t = time_device(lambda: raft_pyramid(f1, f2), ITERS)
    log("raft_corr_pyramid", {"ms_per_frame": t / B * 1e3})
    try:
        raft_pyramid(f1, f2, use_pallas=True)
        t = time_device(
            lambda: raft_pyramid(f1, f2, use_pallas=True), ITERS
        )
        log("raft_corr_pyramid_pallas", {"ms_per_frame": t / B * 1e3})
    except Exception as e:
        log("raft_corr_pyramid_pallas", {"error": repr(e)})

    h8, w8 = p_small.shape[1] // 8, p_small.shape[2] // 8
    xs = jnp.broadcast_to(
        jnp.arange(w8, dtype=jnp.float32), (B, h8, w8)
    )
    ys = jnp.broadcast_to(
        jnp.arange(h8, dtype=jnp.float32)[:, None], (B, h8, w8)
    )
    coords = jnp.stack([xs, ys], axis=-1)

    @jax.jit
    def raft_lookup(pyr, coords):
        return corr_lookup(pyr, coords, 4)

    corr_feat = raft_lookup(pyr, coords)
    t = time_device(lambda: raft_lookup(pyr, coords), ITERS)
    log("raft_corr_lookup_1it", {"ms_per_frame": t / B * 1e3})

    hidden = jnp.tanh(cf[..., :128])
    context = jax.nn.relu(cf[..., 128:])
    flow0 = jnp.zeros((B, h8, w8, 2), jnp.float32)

    @jax.jit
    def raft_update(v, hidden, context, corr_feat, flow0):
        def run(m, *a):
            return m.update_block(*a)

        return rm.apply(v, hidden, context, corr_feat, flow0, method=run)

    raft_update(rv, hidden, context, corr_feat, flow0)
    t = time_device(
        lambda: raft_update(rv, hidden, context, corr_feat, flow0), ITERS
    )
    log("raft_update_block_1it", {"ms_per_frame": t / B * 1e3})
except Exception as e:
    log("raft_substage_error", repr(e))

flow_orig = resize_flow(flow_small, (H, W))


@jax.jit
def piece_warp_mcn(v, prev, flow):
    warped = bilinear_warp(prev, flow)
    pred = runtime._mc(v, warped, flow, prev)
    return pred


pred = piece_warp_mcn(runtime.variables, prev, flow_orig)
t = time_device(
    lambda: piece_warp_mcn(runtime.variables, prev, flow_orig), ITERS
)
c = compiled_cost(piece_warp_mcn, runtime.variables, prev, flow_orig)
log("enc_warp_mcn_1080p", {"ms_per_frame": t / B * 1e3,
                           "flops_per_frame": c["flops"] / B,
                           "mfu": mfu(c["flops"], t)})


@jax.jit
def piece_warp_only(prev, flow):
    return bilinear_warp(prev, flow)


piece_warp_only(prev, flow_orig)
t = time_device(lambda: piece_warp_only(prev, flow_orig), ITERS)
log("enc_warp_only_1080p", {"ms_per_frame": t / B * 1e3})


@jax.jit
def piece_analysis(v, residual, flow):
    from rdvc_tpu.models.codec import VideoCodec

    m = runtime._apply(v, flow, method=VideoCodec.analyze_motion)
    r = runtime._apply(v, residual, method=VideoCodec.analyze_residual)
    return m, r


residual = cur - pred
m_lat, r_lat = piece_analysis(runtime.variables, residual, flow_orig)
t = time_device(
    lambda: piece_analysis(runtime.variables, residual, flow_orig), ITERS
)
c = compiled_cost(piece_analysis, runtime.variables, residual, flow_orig)
log("enc_analysis_1080p", {"ms_per_frame": t / B * 1e3,
                           "flops_per_frame": c["flops"] / B,
                           "mfu": mfu(c["flops"], t)})

# ---------------- device rANS encode ----------------
t = time_device(
    lambda: runtime.encode_frames_device_rans(m_sym, r_sym)[:2], ITERS
)
log("enc_device_rans", {"ms_per_frame": t / B * 1e3})

# assemble (host side incl. word download)
handles = runtime.encode_frames_device_rans(m_sym, r_sym)
t0 = time.perf_counter()
payload_rows = runtime.assemble_frames(handles, B)
t_asm = time.perf_counter() - t0
log("enc_assemble_host", {"ms_per_frame": t_asm / B * 1e3})

# ---------------- host rANS (escape path cost) ----------------
m_np, r_np = runtime.download_symbols(m_sym, r_sym)
t0 = time.perf_counter()
runtime.compress_motion_symbols(m_np[:1])
runtime.compress_residual_symbols(r_np[:1])
t_host = time.perf_counter() - t0
log("host_rans_encode", {"ms_per_frame": t_host * 1e3})

# ---------------- decode pieces ----------------
# Scan decode: T steps x G rows, matching bench's GOP-batched shape.
G = 2
T = min(8, B)  # scan steps reuse the encoded symbol stack (B rows)
mT = jnp.asarray(
    np.repeat(np.asarray(m_sym)[:T][:, None], G, 1)
)  # (T, G, h, w, C)
rT = jnp.asarray(np.repeat(np.asarray(r_sym)[:T][:, None], G, 1))
state = jnp.asarray(
    np.stack([np.asarray(prev[0]), np.asarray(prev[0])])
)  # (G, H, W, 3)

scan_args = (
    runtime.variables, state, state, state, mT, rT,
    jnp.float32(0.0), jnp.float32(0.0), (H, W), True,
)
out = runtime._scan_decode_fn(*scan_args)
t = time_device(lambda: runtime._scan_decode_fn(*scan_args), ITERS)
# XLA cost analysis counts the scan body ONCE regardless of T: the
# compiled cost is one step's worth (all G rows).
c = compiled_cost(runtime._scan_decode_fn, *scan_args)
n_f = T * G
log("decode_scan", {
    "s_per_dispatch": t, "ms_per_frame": t / n_f * 1e3,
    "flops_per_frame": c["flops"] / G, "mfu": mfu(c["flops"] * T, t),
})

# reconstruct only (no post stages)
m_med = jnp.asarray(runtime.motion_tables.medians)
r_med = jnp.asarray(runtime.residual_tables.medians)
rec_args = (
    runtime.variables, state,
    mT[0].astype(jnp.float32) + m_med, rT[0].astype(jnp.float32) + r_med,
    (H, W),
)
runtime._reconstruct_fn(*rec_args)
t = time_device(lambda: runtime._reconstruct_fn(*rec_args), ITERS)
c = compiled_cost(runtime._reconstruct_fn, *rec_args)
log("dec_reconstruct_1080p", {"ms_per_frame": t / G * 1e3,
                              "flops_per_frame": c["flops"] / G,
                              "mfu": mfu(c["flops"], t)})


@jax.jit
def piece_histmatch(a, b):
    return histogram_match_ycrcb(a, b)


piece_histmatch(state, state)
t = time_device(lambda: piece_histmatch(state, state), ITERS)
log("dec_histmatch_1080p", {"ms_per_frame": t / G * 1e3})


@jax.jit
def piece_i420_pack(x):
    return runtime._rgb_to_i420_traced(x)


piece_i420_pack(state)
t = time_device(lambda: piece_i420_pack(state), ITERS)
log("dec_i420_pack", {"ms_per_frame": t / G * 1e3})

# device rANS decode kernel
payloads_m = [p[0] for p in payload_rows]
payloads_r = [p[2] for p in payload_rows]
if all(p is not None and p[0] == 0x03 for p in payloads_m + payloads_r):
    runtime.decode_payloads_device(payloads_m, "motion", (m_sym.shape[1], m_sym.shape[2]))
    t = time_device(
        lambda: (
            runtime.decode_payloads_device(
                payloads_m, "motion", (m_sym.shape[1], m_sym.shape[2])
            ),
            runtime.decode_payloads_device(
                payloads_r, "residual", (r_sym.shape[1], r_sym.shape[2])
            ),
        ),
        ITERS,
    )
    log("dec_device_rans", {"ms_per_frame": t / B * 1e3})
else:
    log("dec_device_rans", {"skipped": "escape payloads present"})

# frame download (I420 1080p)
down = time_transfer_down(out[2])  # (T, G, H*1.5, W) uint8
log("frame_download", {
    "ms_per_frame": down["seconds"] / n_f * 1e3,
    "mb_per_s": down["mb_per_s"],
})

# ---------------- hyperprior path (PROF_HYPER, default on) ----------------
# Device times of the fused hyper encode stages + batched hyper decode at
# the production architecture (random init — timing, not RD). Attribution
# for the 0x04/0x05 transport: stage A (chain+z), per-frame bins graphs,
# stage C (quantize + 4 entropy encodes), batched group decode.
if os.environ.get("PROF_HYPER", "1") != "0":
    try:
        import dataclasses as _dc

        hp_cfg = _dc.replace(
            CodecConfig().model_config(), hyperprior=True
        )
        rth = CodecRuntime(model_cfg=hp_cfg)
        rth.attach_raft(runner.model, runner.variables)

        zm_t, zr_t = rth.motion_hyper_tables, rth.residual_hyper_tables
        stage_a = rth._fused_encode_chain_hyper_fn
        a_args = (
            rth.variables, runner.variables,
            jnp.asarray(zm_t.medians), jnp.asarray(zr_t.medians),
            chain_dev, RAFT_HW, COMP_HW, COMP_HW, True,
        )
        m_lat, r_lat, zs_m, zs_r = stage_a(*a_args)
        t = time_device(lambda: stage_a(*a_args), ITERS)
        log("hyper_enc_stageA_chain_z", {"ms_per_frame": t / B * 1e3})

        _, bins_m_fn, _, _ = rth._hyper_quant_fns["motion"]
        _, bins_r_fn, _, _ = rth._hyper_quant_fns["residual"]
        hw_m = (int(m_lat.shape[1]), int(m_lat.shape[2]))
        hw_r = (int(r_lat.shape[1]), int(r_lat.shape[2]))
        mu_m1, bins_m1 = bins_m_fn(
            rth._flax_variables, zs_m[:1], jnp.asarray(zm_t.medians), hw_m
        )
        t = time_device(
            lambda: bins_m_fn(
                rth._flax_variables, zs_m[:1],
                jnp.asarray(zm_t.medians), hw_m,
            ),
            ITERS,
        )
        log("hyper_enc_bins_motion_1f", {"ms_per_frame": t * 1e3})
        mu_r1, bins_r1 = bins_r_fn(
            rth._flax_variables, zs_r[:1], jnp.asarray(zr_t.medians), hw_r
        )
        t = time_device(
            lambda: bins_r_fn(
                rth._flax_variables, zs_r[:1],
                jnp.asarray(zr_t.medians), hw_r,
            ),
            ITERS,
        )
        log("hyper_enc_bins_residual_1f", {"ms_per_frame": t * 1e3})

        mu_m = jnp.concatenate([mu_m1] * B, 0)
        bins_m = jnp.concatenate([bins_m1] * B, 0)
        mu_r = jnp.concatenate([mu_r1] * B, 0)
        bins_r = jnp.concatenate([bins_r1] * B, 0)
        zm_enc, _ = rth._hyper_device_coders["motion"]
        zr_enc, _ = rth._hyper_device_coders["residual"]
        code_fn = rth._fused_hyper_code_fn
        c_args = (
            m_lat, mu_m, bins_m, zs_m, r_lat, mu_r, bins_r, zs_r,
            zm_enc.encode_consts, zr_enc.encode_consts,
        )
        code_fn(*c_args)
        t = time_device(lambda: code_fn(*c_args), ITERS)
        log("hyper_enc_stageC_coding", {"ms_per_frame": t / B * 1e3})

        # End-to-end batched decode of real payloads (includes kernel +
        # bins; measured as one unit the way the prefetcher runs it).
        handles = rth.encode_pframes_chain_hyper(
            chain_i420, RAFT_HW, COMP_HW, COMP_HW, i420=True
        )
        results = rth.assemble_frames_hyper(handles, B)
        m_payloads = [r[0] for r in results]
        if all(p[13] == 0x03 for p in m_payloads):
            rth.decode_hyper_payloads_device(
                m_payloads, "motion", results[0][1]
            )
            t = time_device(
                lambda: rth.decode_hyper_payloads_device(
                    m_payloads, "motion", results[0][1]
                ),
                ITERS,
            )
            log("hyper_dec_motion_group", {"ms_per_frame": t / B * 1e3})
        else:
            log("hyper_dec_motion_group", {"skipped": "host transport"})
        bpp = sum(len(r[0]) + len(r[2]) for r in results) * 8 / (
            B * H * W
        )
        log("hyper_bpp_random_init", round(bpp, 4))
    except Exception as e:
        log("hyper_profile_error", repr(e))

with open(OUT_PATH, "w") as f:
    json.dump(report, f, indent=2)
print("wrote", OUT_PATH)
