"""Quick device-compute isolation for the bench (VERDICT r2 item #1).

Separates device compute from relay transfer from host coding so the
published stage table attributes the frame time honestly — the ordinary
StageTimer spans measure relay queue position, not stage work (CLAUDE.md).
Used by bench.py after its timed run; scripts/profile_stages.py is the
deep-dive variant with per-subgraph numbers.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from rdvc_tpu.utils.profiling import (
    V5E_PEAK_FLOPS,
    compiled_cost,
    mfu,
    time_device,
    time_transfer_down,
    time_transfer_up,
)


def quick_device_profile(
    runtime,
    raft_variables,
    frames: List[np.ndarray],
    raft_hw,
    comp_hw,
    height: int,
    width: int,
    gop_rows: int = 2,
    scan_t: int = 8,
    batch: int = 8,
    iters: int = 2,
) -> Dict:
    """Measure the encode chain + decode scan device time/FLOPs/MFU and the
    link bandwidth on the CURRENT (already-warm) runtime. Returns a dict
    for bench detail. Frames: uint8 RGB list (>= batch+1)."""
    from rdvc_tpu.io.yuv import rgb_to_yuv420p

    out: Dict = {}
    chain = np.stack([rgb_to_yuv420p(f) for f in frames[: batch + 1]])
    import jax

    chain_dev = jax.device_put(chain)

    up = time_transfer_up(chain, iters=iters)
    out["uplink_mb_per_s"] = round(up["mb_per_s"], 1)

    enc_args = (
        runtime.variables, raft_variables, chain_dev,
        tuple(raft_hw), tuple(comp_hw), tuple(comp_hw),
    )
    enc_fn = runtime._fused_encode_chain_i420_fn
    m_sym, r_sym = enc_fn(*enc_args)
    t_enc = time_device(lambda: enc_fn(*enc_args), iters)
    c_enc = compiled_cost(enc_fn, *enc_args)
    out["encode_device_ms_per_frame"] = round(t_enc / batch * 1e3, 1)
    out["encode_flops_per_frame"] = c_enc["flops"] / batch
    out["encode_mfu"] = round(mfu(c_enc["flops"], t_enc), 4)

    # Decode scan at the bench's GOP-batched shape.
    T, G = scan_t, gop_rows
    m_np = np.asarray(m_sym)
    r_np = np.asarray(r_sym)
    reps = -(-T * G // m_np.shape[0])
    mT = jnp.asarray(
        np.tile(m_np, (reps, 1, 1, 1))[: T * G].reshape(
            (T, G) + m_np.shape[1:]
        )
    )
    rT = jnp.asarray(
        np.tile(r_np, (reps, 1, 1, 1))[: T * G].reshape(
            (T, G) + r_np.shape[1:]
        )
    )
    rgb0 = frames[0].astype(np.float32) / 255.0
    state = jnp.asarray(np.stack([rgb0] * G))
    scan_args = (
        runtime.variables, state, state, state, mT, rT,
        jnp.float32(0.0), jnp.float32(0.0), (height, width), True,
    )
    scan_fn = runtime._scan_decode_fn
    scan_out = scan_fn(*scan_args)
    t_dec = time_device(lambda: scan_fn(*scan_args), iters)
    # XLA's cost analysis counts a lax.scan body ONCE regardless of T
    # (verified empirically), so the compiled cost is one T-step's worth
    # (all G rows): x T for the whole dispatch, / G for per-frame.
    c_dec = compiled_cost(scan_fn, *scan_args)
    out["decode_device_ms_per_frame"] = round(t_dec / (T * G) * 1e3, 1)
    out["decode_flops_per_frame"] = c_dec["flops"] / G
    out["decode_mfu"] = round(mfu(c_dec["flops"] * T, t_dec), 4)

    down = time_transfer_down(scan_out[2], iters=iters)
    out["downlink_mb_per_s"] = round(down["mb_per_s"], 1)
    out["frame_download_ms_per_frame"] = round(
        down["seconds"] / (T * G) * 1e3, 1
    )
    out["peak_flops_denominator"] = V5E_PEAK_FLOPS
    return out


def wall_accounting(
    profile: Dict,
    n_frames: int,
    enc_wall_s: float,
    dec_wall_s: float,
    height: int,
    width: int,
) -> Dict:
    """Transfer-vs-compute table that adds up (approximately) to the wall
    clock. Uploads/downloads are I420 (1.5 B/px); 'other_s' is whatever the
    isolated pieces don't explain (host JPEG/rANS/container IO, dispatch
    overhead, non-overlap). Transfers overlap device compute (the decode
    prefetcher downloads chunk k while chunk k+1 runs), so the serialized
    estimate can exceed wall; 'overlap_s' carries the excess instead of a
    misleading negative 'other_s'."""
    frame_mb = height * width * 1.5 / 1e6
    up_s = n_frames * frame_mb / max(profile["uplink_mb_per_s"], 1e-6)
    down_s = n_frames * frame_mb / max(profile["downlink_mb_per_s"], 1e-6)
    enc_dev = n_frames * profile["encode_device_ms_per_frame"] / 1e3
    dec_dev = n_frames * profile["decode_device_ms_per_frame"] / 1e3

    def _split(wall, *parts):
        other = wall - sum(parts)
        return (round(max(other, 0.0), 2), round(max(-other, 0.0), 2))

    enc_other, enc_overlap = _split(enc_wall_s, enc_dev, up_s)
    dec_other, dec_overlap = _split(dec_wall_s, dec_dev, down_s)
    return {
        "encode": {
            "wall_s": round(enc_wall_s, 2),
            "device_compute_s": round(enc_dev, 2),
            "upload_s": round(up_s, 2),
            "other_s": enc_other,
            "overlap_s": enc_overlap,
        },
        "decode": {
            "wall_s": round(dec_wall_s, 2),
            "device_compute_s": round(dec_dev, 2),
            "download_s": round(down_s, 2),
            "other_s": dec_other,
            "overlap_s": dec_overlap,
        },
    }
