"""All-pairs correlation volume + pyramid lookup (the RAFT hot path).

Spec: RAFT's 4D correlation volume C[i, j] = <f1_i, f2_j> / sqrt(D) over all
pixel pairs at 1/8 resolution, a 4-level pyramid (2x average pooling over
the *second* frame's spatial dims), and per-iteration bilinear lookup of an
r=4 neighborhood (81 points) at each pyramid level around the current flow
target coordinates.

TPU-native formulation:
  * the volume is one big batched matmul (B, HW, C) x (B, C, HW) on the MXU;
  * the pyramid is reduce_window average pooling over a (B*HW, H2, W2, 1)
    view;
  * the lookup is a vectorized 4-tap bilinear gather; all 81 offsets are
    sampled at once per level so XLA emits a handful of fused gathers per
    iteration instead of 81.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def build_corr_pyramid(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
    use_pallas: bool = False,
) -> List[jax.Array]:
    """fmap1/fmap2: (B, H, W, C) 1/8-res features ->
    [(B*H*W, H/2^l, W/2^l, 1)] correlation pyramid.

    use_pallas=True routes to the fused Pallas kernel
    (models/raft/pallas_corr.py): one MXU pass computes the volume and all
    pooled levels without re-reading the volume from HBM — the blockwise
    variant for larger working resolutions (SURVEY.md hard-part 3)."""
    if use_pallas and num_levels == 4:
        from rdvc_tpu.models.raft.pallas_corr import corr_pyramid_pallas

        return corr_pyramid_pallas(fmap1, fmap2)
    B, H, W, C = fmap1.shape
    # Keep the features' dtype (bf16 from the encoders — MXU-native); fp32
    # accumulation via preferred_element_type. HIGHEST precision only
    # affects fp32 inputs (e.g. the CPU test path); bf16 stays single-pass.
    f1 = fmap1.reshape(B, H * W, C)
    f2 = fmap2.reshape(B, H * W, C)
    corr = jnp.einsum(
        "bnc,bmc->bnm",
        f1,
        f2,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(C))
    corr = corr.reshape(B * H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = jax.lax.reduce_window(
            corr, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        pyramid.append(corr)
    return pyramid


def _bilinear_sample_volume(
    vol: jax.Array, xs: jax.Array, ys: jax.Array
) -> jax.Array:
    """vol: (N, H2, W2, 1); xs/ys: (N, P) sample coords (pixel space).
    Returns (N, P) bilinear samples with zero padding outside."""
    N, H2, W2, _ = vol.shape
    v = vol[..., 0]  # (N, H2, W2)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0

    def tap(yi, xi):
        inside = (xi >= 0) & (xi <= W2 - 1) & (yi >= 0) & (yi <= H2 - 1)
        xi_c = jnp.clip(xi, 0, W2 - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H2 - 1).astype(jnp.int32)
        flat = v.reshape(N, H2 * W2)
        idx = yi_c * W2 + xi_c
        vals = jnp.take_along_axis(flat, idx, axis=1)
        return jnp.where(inside, vals, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def corr_lookup(
    pyramid: List[jax.Array],
    coords: jax.Array,
    radius: int = 4,
) -> jax.Array:
    """Sample an r-neighborhood at every pyramid level.

    Args:
      pyramid: list of (B*H*W, H_l, W_l, 1) volumes (level 0 first).
      coords: (B, H, W, 2) current target coordinates (x, y) in level-0
        pixel units.
    Returns:
      (B, H, W, num_levels * (2r+1)^2) correlation features.
    """
    B, H, W, _ = coords.shape
    N = B * H * W
    P = (2 * radius + 1) ** 2
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    dx = dx.reshape(1, P)
    dy = dy.reshape(1, P)
    cx = coords[..., 0].reshape(N, 1).astype(jnp.float32)
    cy = coords[..., 1].reshape(N, 1).astype(jnp.float32)

    out = []
    for lvl, vol in enumerate(pyramid):
        scale = 1.0 / (2 ** lvl)
        xs = cx * scale + dx
        ys = cy * scale + dy
        out.append(_bilinear_sample_volume(vol, xs, ys))  # (N, P)
    feats = jnp.concatenate(out, axis=1)  # (N, L*P)
    return feats.reshape(B, H, W, -1)
