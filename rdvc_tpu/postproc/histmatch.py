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

from typing import Tuple

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


_HIST_CHUNK = 65536
_N16 = 16


def _nibble_onehots(chunk: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """(C,) int32 -> ((C,16), (C,16)) one-hots of the high/low nibbles.
    Padding values of -1 yield an all-zero high row (-1 >> 4 == -1), so
    padded elements contribute nothing to nibble products."""
    n16 = jnp.arange(_N16, dtype=chunk.dtype)
    hi = (chunk >> 4)[:, None] == n16[None, :]
    lo = (chunk & 15)[:, None] == n16[None, :]
    return hi.astype(dtype), lo.astype(dtype)


def _histogram_256(q: jax.Array) -> jax.Array:
    """Scatter-free 256-bin histogram of int32 values in [0, 255].

    TPU scatter-adds serialize, and a dense 256-wide equality matrix is
    256 VPU ops/element. Nibble decomposition cuts that to 32:
    hist[bh*16+bl] = sum_i onehot_hi[i,bh] * onehot_lo[i,bl] — a (16,16)
    outer-product contraction over elements that rides the MXU. Exact:
    0/1 one-hots are exact in bf16 and the MXU accumulates in float32
    (counts stay < 2^24).
    """
    n = q.shape[0]
    pad = (-n) % _HIST_CHUNK
    qp = jnp.pad(q, (0, pad), constant_values=-1)  # -1 hits no bin
    chunks = qp.reshape(-1, _HIST_CHUNK)

    def body(acc, chunk):
        oh_hi, oh_lo = _nibble_onehots(chunk, jnp.bfloat16)
        h2 = jax.lax.dot_general(
            oh_hi, oh_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (16, 16): [bh, bl]
        return acc + h2.reshape(_BINS), None

    hist, _ = jax.lax.scan(body, jnp.zeros(_BINS, jnp.float32), chunks)
    return hist


def _match_channel(src: jax.Array, tmpl: jax.Array) -> jax.Array:
    """Match one flattened uint8-domain channel to a template's histogram.

    Exact skimage semantics (_match_cumulative_cdf): the template's
    piecewise-linear quantile function is built over PRESENT values only
    (zero-count bins are omitted from the knot list,
    skimage/exposure/histogram_matching.py); queries below the first knot
    clamp to the first present value. Interpolating over the dense 0..255
    grid instead (zero-count bins repeated) is wrong for sparse histograms:
    it maps quantiles between two present values onto the empty levels
    between them.
    """
    src_q = jnp.clip(jnp.round(src), 0, 255).astype(jnp.int32)
    tmpl_q = jnp.clip(jnp.round(tmpl), 0, 255).astype(jnp.int32)
    tmpl_hist = _histogram_256(tmpl_q)
    src_cdf = jnp.cumsum(_histogram_256(src_q)) / src_q.shape[0]  # (256,)
    tmpl_cdf = jnp.cumsum(tmpl_hist) / tmpl_q.shape[0]            # (256,)
    present = tmpl_hist > 0
    w = jnp.arange(_BINS, dtype=jnp.int32)

    # For each query quantile q_v = src_cdf[v]: bracket it between the
    # previous knot a (largest present w with tmpl_cdf[w] < q) and the next
    # knot b (smallest present w with tmpl_cdf[w] >= q). 256x256 masks are
    # trivial VPU work.
    q = src_cdf[:, None]                 # (256, 1) queries
    kq = tmpl_cdf[None, :]               # (1, 256) knot quantiles
    pm = present[None, :]
    b = jnp.min(jnp.where(pm & (kq >= q), w[None, :], _BINS), axis=1)
    a = jnp.max(jnp.where(pm & (kq < q), w[None, :], -1), axis=1)
    last = jnp.max(jnp.where(present, w, -1))
    b = jnp.minimum(b, last)             # float-rounding guard: q > last knot

    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    qa = tmpl_cdf[jnp.maximum(a, 0)]
    qb = tmpl_cdf[b]
    t = (src_cdf - qa) / jnp.maximum(qb - qa, 1e-20)
    interp = af + t * (bf - af)
    # a < 0: query at/below the first knot -> clamp to first present value
    # (np.interp left clamp); a >= b only via the rounding guard -> b.
    lut = jnp.where((a < 0) | (a >= b), bf, interp)
    return _apply_lut(lut, src_q)


def _apply_lut(lut: jax.Array, q: jax.Array) -> jax.Array:
    """lut[q] without a gather: data-dependent gathers serialize per index
    on TPU (~20 ns/index — measured 87 ms/frame for this stage at 1080p).
    Nibble decomposition instead of a dense 256-wide one-hot select:
    tmp[i, bh] = lut2d[bh, lo_i] via a (C,16)@(16,16) matmul (HIGHEST
    precision — one-hot rows select float32 LUT entries to ~1 ulp), then
    a 16-wide masked sum picks the high-nibble row: ~32 ops/element
    instead of 256."""
    n = q.shape[0]
    pad = (-n) % _HIST_CHUNK
    qp = jnp.pad(q, (0, pad), constant_values=0)
    chunks = qp.reshape(-1, _HIST_CHUNK)
    lut2d_t = lut.reshape(_N16, _N16).T  # [bl, bh]

    def body(_, chunk):
        oh_hi, oh_lo = _nibble_onehots(chunk, jnp.float32)
        tmp = jnp.dot(
            oh_lo, lut2d_t, precision=jax.lax.Precision.HIGHEST
        )  # (C, 16): tmp[i, bh] = lut[bh*16 + lo_i]
        return None, jnp.sum(oh_hi * tmp, axis=1)

    _, out = jax.lax.scan(body, None, chunks)
    return out.reshape(-1)[:n]


@jax.jit
def histogram_match_ycrcb(current: jax.Array, reference: jax.Array) -> jax.Array:
    """Match `current` to `reference`'s histogram, per YCrCb channel.

    Args:
      current, reference: (B, H, W, 3) float [0,1] RGB frames; each batch
      element is matched against its own reference (histograms are
      per-sample, vmapped over the batch).
    Returns:
      (B, H, W, 3) float [0,1] RGB.
    """
    cur = rgb_to_ycrcb(current)
    ref = rgb_to_ycrcb(reference)
    B = cur.shape[0]
    shape = cur.shape
    cur_flat = cur.reshape(B, -1, 3)
    ref_flat = ref.reshape(B, -1, 3)

    def one(c, r):
        return jnp.stack(
            [_match_channel(c[:, i], r[:, i]) for i in range(3)], axis=-1
        )

    out = jax.vmap(one)(cur_flat, ref_flat)
    return ycrcb_to_rgb(out.reshape(shape))
