"""Tiled one-hot-matmul bilinear warp (TPU-native).

The flat formulation in ops/warp.py pays one TPU gather index per output
pixel (~20 ns/index serialized => ~41-53 ms/frame at 1080p). This module
replaces the 2M per-pixel gathers with:

  1. ONE dynamic-slice per (8, 128) output tile — a halo'd source window
     whose position tracks the tile's mean integer displacement
     (~2K slice starts per 1080p frame instead of 2M gather indices);
  2. per-pixel tap selection INSIDE each window as one-hot matmuls on the
     MXU: a column pick (p x ww one-hot @ window) for x0 and x0+1, then a
     row pick (p x wh one-hot weighted reduce) for y0 and y0+1.

One-hot rows are exact in bf16, so the picked taps equal the bf16-rounded
source values; bilinear weights are applied in float32 afterwards.

Semantics match ops/warp.py `bilinear_warp` (reference WarpingLayer,
/root/reference/codec_processing.py:322-367: align_corners=True grid_sample
with border padding) EXACTLY whenever each pixel's integer source position
stays within `halo` of its tile's mean displacement — true for smooth/
upsampled flow fields (the codec's flows come from RAFT at ~1/3 resolution)
and for border-clamped regions. Pixels whose source deviates further are
clamped to the window edge (a local analogue of border padding). The
encoder and decoder share this op, so the approximation is
bitstream-consistent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Output tile (rows, cols). Small tiles keep the per-tile displacement
# spread well inside the halo (spread ~ tile extent x flow gradient) AND
# cut matmul FLOPs (cost per pixel ~ window area).
_TH, _TW = 8, 32
# Window size (rows, cols): tile + 2*halo + 1, rounded up to multiples of 8.
_WH, _WW = 32, 64  # vertical halo 11, horizontal halo 15
_CHUNK = 512  # tiles per lax.map step (bounds scratch memory)


def _tile_means(disp: jax.Array, nty: int, ntx: int) -> jax.Array:
    """Per-tile mean of a (B, H, W) pixel field -> (B, nty, ntx) int32."""
    B = disp.shape[0]
    t = disp.reshape(B, nty, _TH, ntx, _TW)
    return jnp.round(t.mean(axis=(2, 4))).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("out_dtype", "planar"))
def _warp_tiled_impl(image, fx, fy, out_dtype, planar=False):
    B, H, W, C = image.shape
    nty, ntx = H // _TH, W // _TW
    T = nty * ntx

    xs = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2) + fx
    ys = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1) + fy
    xs = jnp.clip(xs, 0.0, W - 1)
    ys = jnp.clip(ys, 0.0, H - 1)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0).astype(jnp.float32)
    wy = (ys - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Window start per tile: tile origin + mean displacement - halo,
    # clamped so the window stays inside the image.
    xi = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
    yi = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1)
    dx_t = _tile_means(x0i - xi, nty, ntx)  # (B, nty, ntx)
    dy_t = _tile_means(y0i - yi, nty, ntx)
    ox = jnp.arange(ntx, dtype=jnp.int32)[None, None, :] * _TW
    oy = jnp.arange(nty, dtype=jnp.int32)[None, :, None] * _TH
    sx = jnp.clip(ox + dx_t - (_WW - _TW) // 2, 0, W - _WW)  # (B, nty, ntx)
    sy = jnp.clip(oy + dy_t - (_WH - _TH) // 2, 0, H - _WH)

    # Per-pixel local indices inside the window (clamped: the halo bound).
    def to_tiles(a):  # (B, H, W) -> (B*T, TH*TW)
        return (
            a.reshape(B, nty, _TH, ntx, _TW)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B * T, _TH * _TW)
        )

    sx_fl = sx.reshape(B * T)
    sy_fl = sy.reshape(B * T)
    lx = jnp.clip(to_tiles(x0i) - sx_fl[:, None], 0, _WW - 1)
    ly = jnp.clip(to_tiles(y0i) - sy_fl[:, None], 0, _WH - 1)

    P = _TH * _TW
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), T)

    if planar:
        # Planar layout: every intermediate keeps P=256 (or WW/WH) as the
        # minor dim. The channel-minor formulation below materializes
        # (K, P, WH, C) picks whose C=3 minor dim pads to 128 lanes —
        # ~40x the useful bytes (the CLAUDE.md gather-balloon gotcha, in
        # matmul-output form). Here picks are (K, C, WH, P): clean tiles,
        # no transposed operands inside the matmuls.
        img_pl = image.astype(jnp.bfloat16).transpose(0, 3, 1, 2)
        col_iota_p = jax.lax.broadcasted_iota(jnp.int32, (_WW, P), 0)
        row_iota_p = jax.lax.broadcasted_iota(jnp.int32, (_WH, P), 0)

        def chunk_fn(args):
            b_c, sy_c, sx_c, lx_c, ly_c, wx_c, wy_c = args

            def fetch(b, s_y, s_x):
                w = jax.lax.dynamic_slice(
                    img_pl, (b, 0, s_y, s_x), (1, C, _WH, _WW)
                )
                return w.reshape(C, _WH, _WW)

            wnd = jax.vmap(fetch)(b_c, sy_c, sx_c)  # (K, C, WH, WW)

            cx0 = (col_iota_p[None] == lx_c[:, None, :]).astype(jnp.bfloat16)
            lx1 = jnp.minimum(lx_c + 1, _WW - 1)
            cx1 = (col_iota_p[None] == lx1[:, None, :]).astype(jnp.bfloat16)
            dn = (((3,), (1,)), ((0,), (0,)))  # contract WW, batch K
            pickA = jax.lax.dot_general(
                wnd, cx0, dn, preferred_element_type=jnp.float32
            )  # (K, C, WH, P)
            pickB = jax.lax.dot_general(
                wnd, cx1, dn, preferred_element_type=jnp.float32
            )
            top_bot = pickA + (pickB - pickA) * wx_c[:, None, None, :]
            cy0 = (row_iota_p[None] == ly_c[:, None, :]).astype(jnp.float32)
            ly1 = jnp.minimum(ly_c + 1, _WH - 1)
            cy1 = (row_iota_p[None] == ly1[:, None, :]).astype(jnp.float32)
            top = jnp.sum(top_bot * cy0[:, None], axis=2)   # (K, C, P)
            bot = jnp.sum(top_bot * cy1[:, None], axis=2)
            out = top + (bot - top) * wy_c[:, None, :]
            return out.transpose(0, 2, 1)  # (K, P, C)

    else:
        img2d = image.astype(jnp.bfloat16).reshape(B, H, W * C)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (P, _WW), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (P, _WH), 1)

        def chunk_fn(args):
            b_c, sy_c, sx_c, lx_c, ly_c, wx_c, wy_c = args  # (K,) ... (K, P)

            def fetch(b, s_y, s_x):
                w = jax.lax.dynamic_slice(
                    img2d, (b, s_y, s_x * C), (1, _WH, _WW * C)
                )
                return w.reshape(_WH, _WW, C)

            wnd = jax.vmap(fetch)(b_c, sy_c, sx_c)  # (K, WH, WW, C)

            cx0 = (lx_c[:, :, None] == col_iota[None]).astype(jnp.bfloat16)
            lx1 = jnp.minimum(lx_c + 1, _WW - 1)
            cx1 = (lx1[:, :, None] == col_iota[None]).astype(jnp.bfloat16)
            # Column picks on the MXU: (K, P, WW) @ (K, WH, WW, C).
            pickA = jnp.einsum(
                "kpx,kyxc->kpyc", cx0, wnd,
                preferred_element_type=jnp.float32,
            )
            pickB = jnp.einsum(
                "kpx,kyxc->kpyc", cx1, wnd,
                preferred_element_type=jnp.float32,
            )
            # Horizontal lerp first (fuses with the picks), then row picks.
            top_bot = pickA + (pickB - pickA) * wx_c[:, :, None, None]
            cy0 = (ly_c[:, :, None] == row_iota[None]).astype(jnp.float32)
            ly1 = jnp.minimum(ly_c + 1, _WH - 1)
            cy1 = (ly1[:, :, None] == row_iota[None]).astype(jnp.float32)
            top = jnp.einsum("kpy,kpyc->kpc", cy0, top_bot)
            bot = jnp.einsum("kpy,kpyc->kpc", cy1, top_bot)
            return top + (bot - top) * wy_c[:, :, None]

    BT = B * T
    pad = (-BT) % _CHUNK
    def padk(a):
        return jnp.concatenate([a, a[:pad]], 0) if pad else a

    args = tuple(
        padk(a).reshape((BT + pad) // _CHUNK, _CHUNK, *a.shape[1:])
        for a in (bidx, sy_fl, sx_fl, lx, ly, to_tiles(wx), to_tiles(wy))
    )
    out = jax.lax.map(chunk_fn, args)  # (nchunk, K, P, C)
    out = out.reshape(BT + pad, P, C)[:BT]
    out = (
        out.reshape(B, nty, ntx, _TH, _TW, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H, W, C)
    )
    return out.astype(out_dtype)


def warp_tiled_supported(shape) -> bool:
    """Tiled path requires tile-aligned spatial dims and a real win
    (enough pixels that per-pixel gather serialization dominates)."""
    _, H, W, _ = shape
    return H % _TH == 0 and W % _TW == 0 and H * W >= 256 * 256


def bilinear_warp_tiled(
    image: jax.Array, flow: jax.Array, planar: bool = False
) -> jax.Array:
    """Drop-in for ops/warp.py `bilinear_warp` on tile-aligned shapes."""
    if image.ndim != 4 or flow.ndim != 4 or flow.shape[-1] != 2:
        raise ValueError(f"bad shapes image={image.shape} flow={flow.shape}")
    if image.shape[1:3] != flow.shape[1:3]:
        raise ValueError(
            f"image {image.shape} and flow {flow.shape} spatial mismatch"
        )
    B, H, W, C = image.shape
    if not warp_tiled_supported(image.shape):
        raise ValueError(f"untiled shape {image.shape}; use bilinear_warp")
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    if W <= 1:
        fx = jnp.zeros_like(fx)
    if H <= 1:
        fy = jnp.zeros_like(fy)
    return _warp_tiled_impl(image, fx, fy, image.dtype, planar)
