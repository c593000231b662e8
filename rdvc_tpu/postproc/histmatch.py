"""Histogram matching, fully on device.

Spec: reference decoder stage 3 (/root/reference/codec_processing.py:
1587-1659, 1884-1903): convert current and reference frames to YCrCb
(uint8 domain), per-channel skimage match_histograms (empirical-CDF
quantile mapping), clip, convert back. The reference round-trips through
CPU/skimage per frame — a major decode bottleneck (SURVEY.md §3.2); here the
whole stage is a jittable JAX function: 256-bin histograms + CDF
interpolation + a 256-entry LUT gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BINS = 256


def rgb_to_ycrcb(rgb: jax.Array) -> jax.Array:
    """[0,1] float RGB -> YCrCb in the uint8-scaled domain [0,255]."""
    x = rgb.astype(jnp.float32) * 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 128.0
    cb = (b - y) * 0.564 + 128.0
    return jnp.stack([y, cr, cb], axis=-1)


def ycrcb_to_rgb(ycrcb: jax.Array) -> jax.Array:
    """YCrCb [0,255] -> [0,1] float RGB."""
    y, cr, cb = ycrcb[..., 0], ycrcb[..., 1], ycrcb[..., 2]
    r = y + 1.403 * (cr - 128.0)
    g = y - 0.714 * (cr - 128.0) - 0.344 * (cb - 128.0)
    b = y + 1.773 * (cb - 128.0)
    rgb = jnp.stack([r, g, b], axis=-1) / 255.0
    return jnp.clip(rgb, 0.0, 1.0)


def _match_channel(src: jax.Array, tmpl: jax.Array) -> jax.Array:
    """Match one flattened uint8-domain channel to a template's histogram."""
    src_q = jnp.clip(jnp.round(src), 0, 255).astype(jnp.int32)
    tmpl_q = jnp.clip(jnp.round(tmpl), 0, 255).astype(jnp.int32)
    n = src_q.shape[0]
    src_hist = jnp.zeros(_BINS, jnp.float32).at[src_q].add(1.0)
    tmpl_hist = jnp.zeros(_BINS, jnp.float32).at[tmpl_q].add(1.0)
    src_cdf = jnp.cumsum(src_hist) / n
    tmpl_cdf = jnp.cumsum(tmpl_hist) / tmpl_q.shape[0]
    levels = jnp.arange(_BINS, dtype=jnp.float32)
    # value v -> quantile src_cdf[v] -> template value at that quantile
    lut = jnp.interp(src_cdf, tmpl_cdf, levels)
    return lut[src_q]


@jax.jit
def histogram_match_ycrcb(current: jax.Array, reference: jax.Array) -> jax.Array:
    """Match `current` to `reference`'s histogram, per YCrCb channel.

    Args:
      current, reference: (1, H, W, 3) float [0,1] RGB frames.
    Returns:
      (1, H, W, 3) float [0,1] RGB.
    """
    cur = rgb_to_ycrcb(current)
    ref = rgb_to_ycrcb(reference)
    shape = cur.shape
    matched = []
    for ch in range(3):
        m = _match_channel(cur[..., ch].reshape(-1), ref[..., ch].reshape(-1))
        matched.append(m.reshape(shape[:-1]))
    out = jnp.stack(matched, axis=-1)
    return ycrcb_to_rgb(out)
