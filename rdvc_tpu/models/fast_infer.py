"""Lane-aligned inference graph: exact space-to-depth conv rewrites.

TPU layout tiling pads a tensor's minor (channel) dim to 128 lanes, so the
codec's full-resolution low-channel convolutions — the k5 analysis/MCN stems
(2-8 channels in), the whole 32-channel MCN, the final k5 synthesis convs
(2-3 channels out) — run at 1-5% MFU: most of every (8,128) tile is padding
(measured in benchmarks/ab_conv.json / profile_stages.json).

This module rebuilds those stages in space-to-depth (s2d) space at load
time, as an EXACT weight rearrangement of the (BatchNorm-folded) checkpoint:

  - k odd, stride 1  ->  k'=3 conv on s2d tensors with 4x channels
      out[2y+py] = sum_dy in[2y+py+dy] K[dy]  with  dy = 2*dm + qy - py
  - k3, stride 2 (analysis downsample) -> k'=2 conv consuming s2d input,
      emitting normal space: dy = 2*dm + qy, pad (1,0)
  - ConvTranspose k3 s2 'SAME' (flax flips the kernel: out[2m+2-t] += in[m]K[t])
      -> sub-pixel k'=2 conv emitting s2d space, pad (1,0):
      phase 0 <- {K[0]@dm=-1, K[2]@dm=0}, phase 1 <- {K[1]@dm=0}

s2d convention is phase-major: channel index = (qy*2 + qx)*C + c.

A (540,960,128) tensor tiles the (8,128) layout exactly, so every rewritten
conv is a full-lane MXU matmul; the arithmetic cost rises (1.44x for k5,
4x for k3 res convs, 1.78x for the sub-pixel tail) but utilization rises
far more. Reference behavior being rewritten: the Encoder/Decoder/MCN
stacks of codec_processing.py:219-406 (this file only changes HOW they are
computed, not what).

Everything here is inference-only and gated by RDVC_FAST_INFER (default on)
in pipeline/codec_runtime.py; training uses the flax modules unchanged.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rdvc_tpu.models.layers import get_activation
from rdvc_tpu.ops.resize import resize_bilinear, resize_flow
from rdvc_tpu.ops.warp import bilinear_warp

# ----------------------------------------------------------------------
# Space-to-depth primitives (phase-major channel packing)
# ----------------------------------------------------------------------


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,H/2,W/2,4C), channel = (qy*2+qx)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of space_to_depth."""
    B, h, w, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, h, w, 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, 2 * h, 2 * w, C)


# ----------------------------------------------------------------------
# Weight rearrangement (host-side, once at load)
# ----------------------------------------------------------------------


def conv_s1_weights_to_s2d(k: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
    """k-odd stride-1 'same' conv kernel (kh,kw,ci,co) -> s2d-space kernel
    (3,3,4ci,4co) + per-dim (lo,hi) padding. Exact for k in {3,5}."""
    kh, kw, ci, co = k.shape
    p = kh // 2
    lo, hi = (0 - p) // 2, (1 + p) // 2  # floor division
    K = hi - lo + 1
    out = np.zeros((K, K, 4 * ci, 4 * co), np.float64)
    for py in (0, 1):
        for px in (0, 1):
            for qy in (0, 1):
                for qx in (0, 1):
                    for dm in range(lo, hi + 1):
                        dy = 2 * dm + qy - py
                        if abs(dy) > p:
                            continue
                        for dn in range(lo, hi + 1):
                            dx = 2 * dn + qx - px
                            if abs(dx) > p:
                                continue
                            out[
                                dm - lo, dn - lo,
                                (qy * 2 + qx) * ci:(qy * 2 + qx + 1) * ci,
                                (py * 2 + px) * co:(py * 2 + px + 1) * co,
                            ] = k[dy + p, dx + p]
    return out, (-lo, hi)


def conv_s2_weights_to_s2d(k: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
    """k3 stride-2 pad-1 conv kernel -> stride-1 kernel (2,2,4ci,co) that
    consumes s2d input and emits NORMAL-space output at half resolution."""
    kh, kw, ci, co = k.shape
    p = kh // 2
    lo, hi = (-p) // 2, p // 2
    K = hi - lo + 1
    out = np.zeros((K, K, 4 * ci, co), np.float64)
    for qy in (0, 1):
        for qx in (0, 1):
            for dm in range(lo, hi + 1):
                dy = 2 * dm + qy
                if abs(dy) > p:
                    continue
                for dn in range(lo, hi + 1):
                    dx = 2 * dn + qx
                    if abs(dx) > p:
                        continue
                    out[
                        dm - lo, dn - lo,
                        (qy * 2 + qx) * ci:(qy * 2 + qx + 1) * ci, :,
                    ] = k[dy + p, dx + p]
    return out, (-lo, hi)


def convT_s2_weights_to_subpixel(k: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
    """flax ConvTranspose(k3,s2,'SAME') kernel (3,3,ci,co) -> sub-pixel
    stride-1 kernel (2,2,ci,4co) emitting s2d space, pad (1,0).

    flax flips the kernel (verified by impulse probe):
    out[2m + 2 - ty, 2w + 2 - tx] += in[m,w] * K[ty,tx].
    """
    _, _, ci, co = k.shape
    rowmap = {0: {-1: 0, 0: 2}, 1: {0: 1}}  # phase -> {dm: kernel tap}
    out = np.zeros((2, 2, ci, 4 * co), np.float64)
    for py in (0, 1):
        for px in (0, 1):
            for dm, ty in rowmap[py].items():
                for dn, tx in rowmap[px].items():
                    out[
                        dm + 1, dn + 1, :,
                        (py * 2 + px) * co:(py * 2 + px + 1) * co,
                    ] = k[ty, tx]
    return out, (1, 0)


def _tile4(b: np.ndarray) -> np.ndarray:
    """Per-channel bias/params replicated across the 4 phases (phase-major)."""
    return np.tile(np.asarray(b), 4)


# ----------------------------------------------------------------------
# Traced conv helpers
# ----------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _s2d_pad(w) -> Tuple[int, int]:
    """Static padding for an s2d-space kernel: every rearranged kernel here
    is either 3-tap (window dm in [-1,1] -> pad (1,1)) or 2-tap (window
    dm in [-1,0] -> pad (1,0)). Kernel shape is static under jit; the pad
    tuples must NOT live in the param pytree (they would trace as leaves)."""
    return (1, 1) if w.shape[0] == 3 else (1, 0)


def _conv(x, w, pad, stride: int = 1):
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, (stride, stride), (tuple(pad), tuple(pad)),
        dimension_numbers=_DN,
    )


def _conv_transpose(x, w, b):
    """Mirror of flax ConvTranspose(k3,s2,'SAME',use_bias) via lax."""
    y = jax.lax.conv_transpose(
        x.astype(w.dtype), w, (2, 2), "SAME", dimension_numbers=_DN
    )
    return y + b


# ----------------------------------------------------------------------
# Fast param trees (built once at load from BN-folded norm='none' params)
# ----------------------------------------------------------------------


def _cna(p: dict) -> Tuple[np.ndarray, np.ndarray]:
    c = p["Conv_0"]
    return np.asarray(c["kernel"], np.float64), np.asarray(c["bias"], np.float64)


def _res_blocks(p: dict):
    out = []
    for i in range(len([k for k in p if re.fullmatch(r"ResidualBlock_\d+", k)])):
        blk = p[f"ResidualBlock_{i}"]
        out.append((_cna(blk["ConvNormAct_0"]), _cna(blk["ConvNormAct_1"])))
    return out


def _prep_analysis(p: dict, dtype) -> dict:
    """AnalysisTransform params -> fast tree. Stem (k5 s1) + first
    downsample (k3 s2) run in s2d space; the rest is already lane-friendly."""
    n_cna = len([k for k in p if re.fullmatch(r"ConvNormAct_\d+", k)])
    stem_w, stem_b = _cna(p["ConvNormAct_0"])
    down_w, down_b = _cna(p["ConvNormAct_1"])
    sw, _ = conv_s1_weights_to_s2d(stem_w)
    dw, _ = conv_s2_weights_to_s2d(down_w)
    cast = lambda a: jnp.asarray(a, dtype)
    return {
        "s2d": {
            "stem_w": cast(sw), "stem_b": cast(_tile4(stem_b)),
            "down_w": cast(dw), "down_b": cast(down_b),
        },
        "plain": {
            "stem_w": cast(stem_w), "stem_b": cast(stem_b),
            "down_w": cast(down_w), "down_b": cast(down_b),
        },
        "downs": [
            (cast(w), cast(b))
            for w, b in (_cna(p[f"ConvNormAct_{i}"]) for i in range(2, n_cna))
        ],
        "res": [
            (cast(w1), cast(b1), cast(w2), cast(b2))
            for (w1, b1), (w2, b2) in _res_blocks(p)
        ],
        "out": (lambda w, b: (cast(w), cast(b)))(*_cna(p["Conv_0"])),
    }


def _prep_synthesis(p: dict, dtype) -> dict:
    """SynthesisTransform params -> fast tree. EVERY ConvTranspose runs in
    sub-pixel form (stride-1 conv emitting s2d space): trunk layers are
    followed by an immediate depth_to_space; the LAST one feeds the k5
    output conv directly in s2d space (the round-3 tail)."""
    n_up = len([k for k in p if re.fullmatch(r"ConvTransposeNormAct_\d+", k)])
    ups = [_cna_t(p[f"ConvTransposeNormAct_{i}"]) for i in range(n_up)]
    last_w, last_b = ups[-1]
    uw, _ = convT_s2_weights_to_subpixel(last_w)
    out_w, out_b = _cna(p["Conv_0"])
    ow, _ = conv_s1_weights_to_s2d(out_w)
    cast = lambda a: jnp.asarray(a, dtype)
    return {
        "head": (lambda w, b: (cast(w), cast(b)))(*_cna(p["ConvNormAct_0"])),
        "res": [
            (cast(w1), cast(b1), cast(w2), cast(b2))
            for (w1, b1), (w2, b2) in _res_blocks(p)
        ],
        # Trunk ConvTranspose layers in sub-pixel form too (round 4): the
        # same exact rearrangement the tail uses — a stride-1 (2,2,ci,4co)
        # conv emitting s2d space + depth_to_space. lax.conv_transpose
        # lowers through input dilation (measured 42% MFU, round 3);
        # plain stride-1 convs tile the MXU like the analysis convs
        # (67% MFU) and the d2s is a fusable transpose.
        "ups": [
            (cast(convT_s2_weights_to_subpixel(w)[0]), cast(_tile4(b)))
            for w, b in ups[:-1]
        ],
        "tail": {
            "up_w": cast(uw),
            "up_b": cast(_tile4(last_b)),
            "out_w": cast(ow),
            "out_b": cast(_tile4(out_b)),
        },
    }


def _cna_t(p: dict) -> Tuple[np.ndarray, np.ndarray]:
    c = p["ConvTranspose_0"]
    return np.asarray(c["kernel"], np.float64), np.asarray(c["bias"], np.float64)


def _prep_mcn(p: dict, dtype) -> dict:
    """MCN params -> fast tree: the ENTIRE network runs in s2d space (all
    of it is full-resolution at <=32 channels)."""
    stem_w, stem_b = _cna(p["ConvNormAct_0"])
    out_w, out_b = _cna(p["Conv_0"])
    sw, _ = conv_s1_weights_to_s2d(stem_w)
    ow, _ = conv_s1_weights_to_s2d(out_w)
    cast = lambda a: jnp.asarray(a, dtype)
    return {
        "s2d": {
            "stem_w": cast(sw), "stem_b": cast(_tile4(stem_b)),
            "res": [
                (
                    cast(conv_s1_weights_to_s2d(w1)[0]), cast(_tile4(b1)),
                    cast(conv_s1_weights_to_s2d(w2)[0]), cast(_tile4(b2)),
                )
                for (w1, b1), (w2, b2) in _res_blocks(p)
            ],
            "out_w": cast(ow), "out_b": cast(_tile4(out_b)),
        },
        "plain": {
            "stem_w": cast(stem_w), "stem_b": cast(stem_b),
            "res": [
                (cast(w1), cast(b1), cast(w2), cast(b2))
                for (w1, b1), (w2, b2) in _res_blocks(p)
            ],
            "out_w": cast(out_w), "out_b": cast(out_b),
        },
    }


def build_fast_params(params: dict, dtype=jnp.bfloat16) -> dict:
    """BN-folded (norm='none') VideoCodec params -> fast inference tree.

    An int8 weight path was measured here in round 3 and REMOVED in round
    4: with dynamic per-tensor activation scales it was slower than bf16
    on every stage (benchmarks/profile_stages_latest.json
    encode_chain_int8 68.3 vs 66.6 ms/frame, dec_reconstruct_int8 59.3 vs
    57.3) — the scale reductions serialized against the convs and v5e's
    int8 MXU rate never paid for them."""
    return {
        "motion_encoder": _prep_analysis(params["motion_encoder"], dtype),
        "residual_encoder": _prep_analysis(params["residual_encoder"], dtype),
        "motion_decoder": _prep_synthesis(params["motion_decoder"], dtype),
        "residual_decoder": _prep_synthesis(params["residual_decoder"], dtype),
        "mcn": _prep_mcn(params["motion_compensation_net"], dtype),
    }


# ----------------------------------------------------------------------
# Traced forward functions
# ----------------------------------------------------------------------


def analysis_apply(fp: dict, x: jax.Array, act, dtype) -> jax.Array:
    x = x.astype(dtype)
    H, W = x.shape[1:3]
    if H % 2 == 0 and W % 2 == 0:
        s = fp["s2d"]
        z = space_to_depth(x)
        z = act(_conv(z, s["stem_w"], _s2d_pad(s["stem_w"])) + s["stem_b"])
        z = act(_conv(z, s["down_w"], _s2d_pad(s["down_w"])) + s["down_b"])
    else:
        p = fp["plain"]
        k = p["stem_w"].shape[0] // 2
        z = act(_conv(x, p["stem_w"], (k, k)) + p["stem_b"])
        z = act(_conv(z, p["down_w"], (1, 1), stride=2) + p["down_b"])
    for w, b in fp["downs"]:
        z = act(_conv(z, w, (1, 1), stride=2) + b)
    for w1, b1, w2, b2 in fp["res"]:
        y = act(_conv(z, w1, (1, 1)) + b1)
        y = _conv(y, w2, (1, 1)) + b2
        z = act(y + z)
    w, b = fp["out"]
    return (_conv(z, w, (1, 1)) + b).astype(jnp.float32)


def synthesis_apply(
    fp: dict, y: jax.Array, act, dtype,
    final_act: Optional[Callable] = None,
) -> jax.Array:
    z = y.astype(dtype)
    w, b = fp["head"]
    z = act(_conv(z, w, (1, 1)) + b)
    for w1, b1, w2, b2 in fp["res"]:
        t = act(_conv(z, w1, (1, 1)) + b1)
        t = _conv(t, w2, (1, 1)) + b2
        z = act(t + z)
    for w, b in fp["ups"]:
        z = act(_conv(z, w, _s2d_pad(w)) + b)
        z = depth_to_space(z)
    t = fp["tail"]
    z = act(_conv(z, t["up_w"], _s2d_pad(t["up_w"])) + t["up_b"])
    z = _conv(z, t["out_w"], _s2d_pad(t["out_w"])) + t["out_b"]
    z = depth_to_space(z).astype(jnp.float32)
    if final_act is not None:
        z = final_act(z)
    return z


def mcn_apply(
    fp: dict, warped: jax.Array, flow: jax.Array, ref: jax.Array, act, dtype
) -> jax.Array:
    x = jnp.concatenate([warped, flow, ref], axis=-1).astype(dtype)
    H, W = x.shape[1:3]
    if H % 2 == 0 and W % 2 == 0:
        s = fp["s2d"]
        z = space_to_depth(x)
        z = act(_conv(z, s["stem_w"], _s2d_pad(s["stem_w"])) + s["stem_b"])
        for w1, b1, w2, b2 in s["res"]:
            t = act(_conv(z, w1, (1, 1)) + b1)
            t = _conv(t, w2, (1, 1)) + b2
            z = act(t + z)
        z = _conv(z, s["out_w"], _s2d_pad(s["out_w"])) + s["out_b"]
        z = depth_to_space(z)
    else:
        p = fp["plain"]
        z = act(_conv(x, p["stem_w"], (2, 2)) + p["stem_b"])
        for w1, b1, w2, b2 in p["res"]:
            t = act(_conv(z, w1, (1, 1)) + b1)
            t = _conv(t, w2, (1, 1)) + b2
            z = act(t + z)
        z = _conv(z, p["out_w"], (2, 2)) + p["out_b"]
    mask = jax.nn.sigmoid(z.astype(jnp.float32))
    return warped.astype(jnp.float32) * mask


class FastCodecApply:
    """Drop-in for `VideoCodec.apply(variables, *args, method=...)` on the
    inference methods, reading rearranged weights from variables['fast'].
    pipeline/codec_runtime.py swaps this in post-BN-fold (RDVC_FAST_INFER)."""

    def __init__(self, cfg, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.dtype = dtype
        self.act = get_activation(cfg.activation)

    def __call__(self, variables, *args, method=None, **kwargs):
        fp = variables["fast"]
        name = getattr(method, "__name__", None)
        if name == "analyze_motion":
            return analysis_apply(fp["motion_encoder"], args[0], self.act, self.dtype)
        if name == "analyze_residual":
            return analysis_apply(fp["residual_encoder"], args[0], self.act, self.dtype)
        if name == "synthesize_flow":
            return synthesis_apply(fp["motion_decoder"], args[0], self.act, self.dtype)
        if name == "synthesize_residual":
            return synthesis_apply(fp["residual_decoder"], args[0], self.act, self.dtype)
        if name == "apply_mcn":
            return mcn_apply(fp["mcn"], *args[:3], self.act, self.dtype)
        if name == "reconstruct_p_frame":
            return self._reconstruct(fp, *args[:4])
        raise NotImplementedError(f"FastCodecApply: unsupported method {name}")

    def _reconstruct(self, fp, prev, q_m, q_r, target_hw):
        """Mirror of VideoCodec.reconstruct_p_frame (models/codec.py)."""
        H, W = int(target_hw[0]), int(target_hw[1])
        flow_low = synthesis_apply(fp["motion_decoder"], q_m, self.act, self.dtype)
        flow_up = resize_flow(flow_low, (H, W))
        warped = bilinear_warp(prev, flow_up)
        mc = mcn_apply(fp["mcn"], warped, flow_up, prev, self.act, self.dtype)
        res_low = synthesis_apply(fp["residual_decoder"], q_r, self.act, self.dtype)
        res_up = resize_bilinear(res_low, (H, W))
        recon = jnp.clip(mc + res_up, 0.0, 1.0)
        return {
            "reconstructed": recon,
            "flow": flow_up,
            "warped": warped,
            "motion_compensated": mc,
            "residual": res_up,
        }
