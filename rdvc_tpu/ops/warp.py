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

import jax
import jax.numpy as jnp


def bilinear_warp(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp `image` by `flow`.

    Args:
      image: (B, H, W, C) array.
      flow:  (B, H, W, 2) array; flow[..., 0] = dx (horizontal, +right),
             flow[..., 1] = dy (vertical, +down), in pixels.

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

    # Four pointwise flat gathers + blend. (A single (2,2)-windowed
    # lax.gather would quarter the index count, but TPU layout tiling pads
    # the tiny (2,2,C) trailing slice dims to (8,128) tiles — the fusion
    # output balloons ~40x and OOMs at 1080p. The flat formulation keeps
    # gather outputs (B, H*W, C), which tile cleanly.)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = img.reshape(B, H * W, C)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, H * W, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(B, H, W, C)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    out = top + (bot - top) * wy
    return out.astype(orig_dtype)
