"""Bilinear image/flow resize as separable matmuls (MXU-friendly).

Behavioral spec: torch F.interpolate(mode='bilinear', align_corners=False,
antialias=False) as used by the reference's `resize_flow`
(/root/reference/codec_processing.py:772-818): resize the 2-channel flow
field bilinearly, then rescale dx by W_out/W_in and dy by H_out/H_in.

Instead of a gather, we build per-axis (out, in) interpolation matrices with
two nonzeros per row and contract them on the MXU — on TPU a small dense
matmul beats a strided gather and fuses with surrounding elementwise work.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int, antialias: bool = False) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation weights, half-pixel centers
    (align_corners=False), edges clamped.

    With antialias=True and n_out < n_in, the triangle filter support is
    widened by the scale factor (torchvision TF.resize(antialias=True)
    semantics, used by the reference's residual downscale,
    codec_processing.py:1463-1469)."""
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    scale = n_in / n_out
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    if antialias and scale > 1.0:
        support = scale  # triangle filter stretched by the downscale factor
        lo = np.ceil(src - support).astype(np.int64)
        hi = np.floor(src + support).astype(np.int64)
        mat = np.zeros((n_out, n_in), dtype=np.float64)
        for i in range(n_out):
            j = np.arange(lo[i], hi[i] + 1)
            w = np.maximum(0.0, 1.0 - np.abs(j - src[i]) / support)
            jc = np.clip(j, 0, n_in - 1)
            np.add.at(mat[i], jc, w)
        mat /= mat.sum(axis=1, keepdims=True)
        return mat.astype(np.float32)
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = src - lo
    mat = np.zeros((n_out, n_in), dtype=np.float32)
    rows = np.arange(n_out)
    mat[rows, lo] += (1.0 - w_hi).astype(np.float32)
    mat[rows, hi] += w_hi.astype(np.float32)
    return mat


def resize_bilinear(
    x: jax.Array, out_hw: Tuple[int, int], antialias: bool = False
) -> jax.Array:
    """Bilinear-resize (B, H, W, C) -> (B, H_out, W_out, C)."""
    B, H, W, C = x.shape
    H_out, W_out = int(out_hw[0]), int(out_hw[1])
    if (H, W) == (H_out, W_out):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    wh = jnp.asarray(_interp_matrix(H, H_out, antialias))
    ww = jnp.asarray(_interp_matrix(W, W_out, antialias))
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,bhwc->bowc", wh, xf, precision=hp)
    y = jnp.einsum("pw,bhwc->bhpc", ww, y, precision=hp)
    return y.astype(dtype)


def resize_flow(
    flow: jax.Array, target_hw: Tuple[int, int]
) -> Optional[jax.Array]:
    """Resize a (B, H, W, 2) flow field and rescale its displacement values.

    dx scales by W_out/W_in, dy by H_out/H_in (reference
    codec_processing.py:772-818). Returns None for degenerate targets,
    matching the reference's zero-dim guards.
    """
    if flow is None:
        return None
    B, H, W, C = flow.shape
    if C != 2:
        raise ValueError(f"flow must have 2 channels, got {flow.shape}")
    H_out, W_out = int(target_hw[0]), int(target_hw[1])
    if H_out <= 0 or W_out <= 0 or H <= 0 or W <= 0:
        return None
    if (H, W) == (H_out, W_out):
        return flow
    resized = resize_bilinear(flow, (H_out, W_out))
    scale = jnp.asarray([W_out / W, H_out / H], dtype=resized.dtype)
    return resized * scale
