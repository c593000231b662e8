"""Inference-time BatchNorm folding.

The reference runs Conv -> BatchNorm -> LeakyReLU stacks in eval mode
(codec_processing.py:116-156 with model.eval()), where BatchNorm is a fixed
per-channel affine: y = (x - mean) / sqrt(var + eps) * scale + bias. That
affine composes exactly into the preceding convolution's kernel and bias:

    kernel' = kernel * s,   bias' = bias_bn - mean * s,
    s       = scale / sqrt(var + eps)

Folding removes every norm layer from the inference graph: no f32
cast-round-trips around 1080p activations, fewer fusion barriers, and the
conv epilogue is just bias+LeakyReLU. This matters on TPU where the norm's
f32 scale/shift at full resolution is pure HBM traffic.

Usage: transform a (params, batch_stats) pair trained with norm='batch'
into a params tree for the SAME architecture instantiated with norm='none'
(ConvNormAct then builds its conv with use_bias=True and no BatchNorm
submodule — see models/layers.py).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

_EPS = 1e-5  # matches models/layers.py _make_norm
_CONV_KEYS = ("Conv_0", "ConvTranspose_0")


def _fold_scope(params: dict, stats: dict) -> dict:
    """Fold one module scope (non-recursive part): if this scope holds a
    conv followed by BatchNorm_0, merge them; otherwise return params
    unchanged. Both flax kernels are (kh, kw, cin, cout) — the scale
    broadcasts over the trailing output-channel axis."""
    if "BatchNorm_0" not in params:
        return params
    conv_key = next((k for k in _CONV_KEYS if k in params), None)
    if conv_key is None:  # norm without conv in scope: leave untouched
        return params
    bn = params["BatchNorm_0"]
    st = stats["BatchNorm_0"]
    s = np.asarray(bn["scale"], np.float64) / np.sqrt(
        np.asarray(st["var"], np.float64) + _EPS
    )
    shift = np.asarray(bn["bias"], np.float64) - np.asarray(
        st["mean"], np.float64
    ) * s

    conv = dict(params[conv_key])
    kernel = np.asarray(conv["kernel"], np.float64) * s  # (..., cout) * (cout,)
    bias = np.asarray(conv.get("bias", 0.0), np.float64) * s + shift
    out = {
        k: v for k, v in params.items() if k not in ("BatchNorm_0", conv_key)
    }
    out[conv_key] = {
        "kernel": jnp.asarray(kernel, jnp.float32),
        "bias": jnp.asarray(bias, jnp.float32),
    }
    return out


def fold_batchnorms(params: dict, batch_stats: dict) -> dict:
    """Recursively fold every Conv->BatchNorm pair; returns a params tree
    for the norm='none' instantiation of the same model. Scopes without a
    BatchNorm (entropy bottlenecks, bare Convs) pass through unchanged."""

    def rec(p, st):
        if not isinstance(p, dict):
            return p
        p = {
            k: rec(v, st.get(k, {}) if isinstance(st, dict) else {})
            for k, v in p.items()
        }
        return _fold_scope(p, st if isinstance(st, dict) else {})

    return rec(params, batch_stats or {})


def foldable(params: dict) -> bool:
    """True if the tree contains at least one BatchNorm to fold."""
    if not isinstance(params, dict):
        return False
    if "BatchNorm_0" in params:
        return True
    return any(foldable(v) for v in params.values() if isinstance(v, dict))
