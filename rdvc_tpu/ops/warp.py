"""Bilinear backward warping (TPU-native gather formulation).

Behavioral spec: the reference WarpingLayer
(/root/reference/codec_processing.py:322-367) builds a normalized [-1,1]
meshgrid (align_corners=True), adds flow normalized by (W-1)/2 and (H-1)/2,
and calls F.grid_sample(mode='bilinear', padding_mode='border').

With align_corners=True that is algebraically identical to sampling at pixel
coordinates (x + dx, y + dy) with indices clamped to the image border — which
is how we implement it here: a 4-tap bilinear gather in pixel space, fully
vectorized so XLA lowers it to TPU gathers fused with the blend arithmetic.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _warp_impl() -> str:
    """'tiled' routes tile-aligned shapes through ops/warp_tiled.py (one
    dynamic-slice per tile + one-hot MXU picks instead of 2M serialized
    per-pixel gathers). Read at trace time: set RDVC_WARP before first use."""
    return os.environ.get("RDVC_WARP", "tiled").lower()


def bilinear_warp(
    image: jax.Array, flow: jax.Array, impl: str | None = None
) -> jax.Array:
    """Backward-warp `image` by `flow`.

    Args:
      image: (B, H, W, C) array.
      flow:  (B, H, W, 2) array; flow[..., 0] = dx (horizontal, +right),
             flow[..., 1] = dy (vertical, +down), in pixels.
      impl:  None -> RDVC_WARP env ('tiled' default); 'flat' forces the
             per-pixel gather (training uses it: the tiled path's backward
             would turn window slices into serialized TPU scatter-adds).

    Returns:
      (B, H, W, C) warped image, same dtype as `image`.
    """
    if image.ndim != 4 or flow.ndim != 4 or flow.shape[-1] != 2:
        raise ValueError(f"bad shapes image={image.shape} flow={flow.shape}")
    if image.shape[1:3] != flow.shape[1:3]:
        raise ValueError(
            f"image {image.shape} and flow {flow.shape} spatial mismatch"
        )
    B, H, W, C = image.shape
    sel = impl or _warp_impl()
    if sel in ("tiled", "planar"):
        from rdvc_tpu.ops.warp_tiled import (
            bilinear_warp_tiled,
            warp_tiled_supported,
        )

        if warp_tiled_supported(image.shape):
            return bilinear_warp_tiled(image, flow, planar=sel == "planar")
    orig_dtype = image.dtype
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)

    # Degenerate axes: reference zeroes normalized flow when W==1 or H==1.
    if W <= 1:
        fx = jnp.zeros_like(fx)
    if H <= 1:
        fy = jnp.zeros_like(fy)

    xs = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2) + fx
    ys = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1) + fy

    # Border padding == clamp sample positions to the valid pixel box.
    xs = jnp.clip(xs, 0.0, W - 1)
    ys = jnp.clip(ys, 0.0, H - 1)

    img = image.astype(jnp.float32)
    if H < 2 or W < 2:
        # Degenerate spatial axes: flow is zeroed above, warp is identity.
        return image

    # ONE pointwise flat gather of all four bilinear taps. TPU gathers
    # serialize per index (~20 ns/index measured through XLA), so index
    # count — not payload bytes — is the cost: the four taps are packed
    # into the channel axis ([img, shift_x, shift_y, shift_xy], border-
    # clamped shifts) and fetched with the single (y0, x0) index. This
    # quarters the index count vs four separate tap gathers (163 -> ~41
    # ms/frame at 1080p). A (2,2)-windowed lax.gather would also use one
    # index, but TPU layout tiling pads the tiny (2,2,C) trailing slice
    # dims to (8,128) tiles — the fusion output balloons ~40x and OOMs at
    # 1080p. Flat (B, H*W, 4C) outputs tile cleanly.
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Border-clamped +1 shifts reproduce x1 = min(x0+1, W-1) etc.
    shx = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    shy = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    shxy = jnp.concatenate([shx[:, 1:], shx[:, -1:]], axis=1)
    quad = jnp.concatenate([img, shx, shy, shxy], axis=-1)
    flat = quad.reshape(B, H * W, 4 * C)

    idx = (y0i * W + x0i).reshape(B, H * W, 1)
    g = jnp.take_along_axis(flat, idx, axis=1).reshape(B, H, W, 4 * C)
    v00 = g[..., 0 * C : 1 * C]
    v01 = g[..., 1 * C : 2 * C]
    v10 = g[..., 2 * C : 3 * C]
    v11 = g[..., 3 * C : 4 * C]

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    out = top + (bot - top) * wy
    return out.astype(orig_dtype)
