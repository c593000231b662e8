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

    # ONE windowed gather instead of four pointwise gathers (TPU gathers
    # pay per-index; fetching the 2x2 tap block per pixel quarters the
    # index count). The window origin is clamped so the slice stays in
    # bounds; the local coordinate then lands in [0, 1] and reproduces
    # border-clamp semantics exactly (at the border the blend weight hits
    # exactly 0 or 1, selecting the duplicated tap).
    sy = jnp.minimum(jnp.floor(ys).astype(jnp.int32), H - 2)
    sx = jnp.minimum(jnp.floor(xs).astype(jnp.int32), W - 2)
    starts = jnp.stack(
        [sy.reshape(B, H * W), sx.reshape(B, H * W)], axis=-1
    )  # (B, N, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    win = jax.lax.gather(
        img, starts, dnums, slice_sizes=(1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (B, N, 2, 2, C)

    lx = (xs - sx.astype(jnp.float32)).reshape(B, H * W, 1)
    ly = (ys - sy.astype(jnp.float32)).reshape(B, H * W, 1)
    w00 = win[:, :, 0, 0]
    w01 = win[:, :, 0, 1]
    w10 = win[:, :, 1, 0]
    w11 = win[:, :, 1, 1]
    top = w00 + (w01 - w00) * lx
    bot = w10 + (w11 - w10) * lx
    out = (top + (bot - top) * ly).reshape(B, H, W, C)
    return out.astype(orig_dtype)
