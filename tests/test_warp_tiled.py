"""Tiled one-hot warp (ops/warp_tiled.py) vs the flat-gather reference
(ops/warp.py) on representative codec flow fields."""

import numpy as np
import jax.numpy as jnp
import pytest

from rdvc_tpu.ops.warp import bilinear_warp
from rdvc_tpu.ops.warp_tiled import bilinear_warp_tiled, warp_tiled_supported

H, W = 256, 256  # tile-aligned (8, 128), above the size gate


def _image(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(b, H, W, 3).astype(np.float32))


def _check(flow, atol=2e-2):
    img = _image()
    # impl="flat" pins the per-pixel-gather reference explicitly (the
    # default impl IS the tiled path — comparing against it is vacuous).
    ref = np.asarray(bilinear_warp(img, flow, impl="flat"))
    out = np.asarray(bilinear_warp_tiled(img, flow))
    # Taps are bf16-rounded in the tiled path (one-hot picks are exact,
    # values are bf16): tolerance is bf16 resolution on [0,1] data.
    np.testing.assert_allclose(out, ref, atol=atol)
    # The planar layout variant computes the identical pick/lerp
    # arithmetic in (C-major) tiles: it must match the tiled path to
    # float rounding.
    pl = np.asarray(bilinear_warp_tiled(img, flow, planar=True))
    np.testing.assert_allclose(pl, out, atol=1e-5)


def test_zero_flow_identity():
    _check(jnp.zeros((2, H, W, 2), jnp.float32), atol=1e-2)


def test_smooth_translation():
    rng = np.random.RandomState(1)
    base = rng.randn(2, 1, 1, 2).astype(np.float32) * 5
    flow = jnp.asarray(np.broadcast_to(base, (2, H, W, 2)).copy())
    _check(flow)


def test_large_translation_beyond_halo():
    # Global displacement far exceeds the 15-px halo — the per-tile mean
    # window placement must absorb it exactly.
    flow = jnp.full((2, H, W, 2), 57.3, jnp.float32)
    _check(flow)


def test_border_clipping_flow():
    # Flow pushing far outside the image: border clamp semantics.
    flow = jnp.full((2, H, W, 2), -300.0, jnp.float32)
    _check(flow)


def test_rotation_like_field():
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    cx, cy = W / 2, H / 2
    theta = 0.01  # ~0.57 deg: up to ~1.8 px displacement at corners
    fx = (np.cos(theta) - 1) * (xs - cx) - np.sin(theta) * (ys - cy)
    fy = np.sin(theta) * (xs - cx) + (np.cos(theta) - 1) * (ys - cy)
    flow = jnp.asarray(
        np.broadcast_to(np.stack([fx, fy], -1)[None], (2, H, W, 2)).copy()
    )
    _check(flow)


def test_smooth_random_field():
    # Upsampled low-res noise with REALISTIC magnitudes (+-10 px, smooth):
    # the regime of RAFT-derived flow away from motion boundaries. (Note
    # resize_flow would also scale the vectors 32x here, producing a
    # slope-2 ramp no codec flow exhibits — the tiled warp's halo is sized
    # for real flows, so the field is built with resize_bilinear instead.)
    rng = np.random.RandomState(3)
    low = rng.randn(2, 8, 8, 2).astype(np.float32) * 10
    from rdvc_tpu.ops.resize import resize_bilinear

    flow = resize_bilinear(jnp.asarray(low), (H, W))
    _check(flow)


def test_supported_gate():
    assert warp_tiled_supported((1, H, W, 3))
    assert not warp_tiled_supported((1, 250, W, 3))   # row misaligned
    assert not warp_tiled_supported((1, H, 200, 3))   # col misaligned
    assert not warp_tiled_supported((1, 64, 128, 3))  # too small to pay off
    with pytest.raises(ValueError):
        bilinear_warp_tiled(
            jnp.zeros((1, 64, 128, 3)), jnp.zeros((1, 64, 128, 2))
        )
