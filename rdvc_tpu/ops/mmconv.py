"""Convolution as MXU matmuls (shifted-slice einsum accumulation).

Motivation (measured on the target chip, benchmarks/profile_stages.json):
XLA's native conv lowering on this platform runs the codec's conv stacks
at ~2-7% MFU while a plain bf16 matmul reaches ~49%. Reformulating convs
as accumulated strided-slice einsums routes the same math through the
matmul path XLA compiles well:

    y = sum_{dy,dx} slice(x_pad, dy::s, dx::s) @ W[dy, dx]

Two regimes:
  * Cin >= MIN_K_CHANNELS: per-tap einsum accumulation (each tap already
    has a healthy contraction dim).
  * Cin small (e.g. RGB/flow stems): im2col — concatenate the kh*kw taps
    along channels first so the single matmul contracts over kh*kw*Cin.

Numerics match jax.lax.conv_general_dilated with bf16 inputs and float32
accumulation (preferred_element_type). Parameter layout is HWIO — the
same as flax nn.Conv/nn.ConvTranspose — so checkpoints are interchangeable.

Toggle: layers.py consults use_mm_conv() (env RDVC_CONV_IMPL=mm|xla,
default mm). The transpose variant decomposes the k3s2 up-conv into the
four output phases, each a tiny stride-1 conv, interleaved on write.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

MIN_K_CHANNELS = 32


def use_mm_conv() -> bool:
    """Default is the XLA native conv path: the A/B on the target chip
    (benchmarks/ab_conv.json) measured mmconv SLOWER at every codec shape
    (0.14x-0.83x) — XLA's conv lowering beats explicit shifted-slice
    einsums here, and transpose convs already reach ~42% MFU natively.
    The module stays as a measured-and-rejected alternative (and a future
    escape hatch for platforms with a worse conv path)."""
    return os.environ.get("RDVC_CONV_IMPL", "xla").lower() == "mm"


def conv2d_mm(
    x: jax.Array,                # (B, H, W, Cin)
    w: jax.Array,                # (kh, kw, Cin, Cout) — HWIO (flax layout)
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
) -> jax.Array:
    """'Same-family' conv via matmuls; returns (B, Ho, Wo, Cout) float32.

    Ho = (H + 2*ph - kh)//sh + 1 (standard conv arithmetic).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    sh, sw = stride
    ph, pw = padding
    Ho = (H + 2 * ph - kh) // sh + 1
    Wo = (W + 2 * pw - kw) // sw + 1
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))

    def tap(dy, dx):
        return jax.lax.slice(
            xp,
            (0, dy, dx, 0),
            (B, dy + (Ho - 1) * sh + 1, dx + (Wo - 1) * sw + 1, Cin),
            (1, sh, sw, 1),
        )

    if Cin >= MIN_K_CHANNELS:
        acc = None
        for dy in range(kh):
            for dx in range(kw):
                t = jnp.einsum(
                    "bhwc,cd->bhwd", tap(dy, dx), w[dy, dx],
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        return acc
    # im2col: contract over all taps at once (K = kh*kw*Cin)
    patches = jnp.concatenate(
        [tap(dy, dx) for dy in range(kh) for dx in range(kw)], axis=-1
    )
    wcol = w.transpose(0, 1, 2, 3).reshape(kh * kw * Cin, Cout)
    return jnp.einsum(
        "bhwk,kd->bhwd", patches, wcol,
        preferred_element_type=jnp.float32,
    )


def conv_transpose2d_mm(
    x: jax.Array,                # (B, H, W, Cin)
    w: jax.Array,                # (kh, kw, Cin, Cout) — HWIO (flax layout)
) -> jax.Array:
    """2x up-convolution (k=3, s=2, 'SAME': out = 2*in), via four phase
    matmul convs interleaved into the output grid.

    Matches jax.lax.conv_transpose(strides=(2,2), padding='SAME') — what
    flax nn.ConvTranspose computes. Delta-probed contribution map (unit
    test enforces it): out[2i+2-u, 2j+2-v] += x[i, j] @ w[u, v], i.e. for
    output row 2o+ry the taps are the u with (u + ry) even, reading
    x[o + (u - 2 + ry)//2]:
      ry=0: u=0 -> x[o-1], u=2 -> x[o]
      ry=1: u=1 -> x[o]
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    assert kh == 3 and kw == 3, "phase decomposition implemented for k=3"

    def phase(ry, rx):
        pairs_y = []
        for u in range(3):
            if (u + ry) % 2 == 0:
                pairs_y.append((u, (u - 2 + ry) // 2))
        pairs_x = []
        for v in range(3):
            if (v + rx) % 2 == 0:
                pairs_x.append((v, (v - 2 + rx) // 2))
        acc = None
        for u, oy in pairs_y:
            for v, ox in pairs_x:
                # x shifted by (oy, ox) with zero padding at borders
                src = jnp.pad(
                    x, ((0, 0), (1, 1), (1, 1), (0, 0))
                )[:, 1 + oy : 1 + oy + H, 1 + ox : 1 + ox + W]
                t = jnp.einsum(
                    "bhwc,cd->bhwd", src, w[u, v],
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        return acc

    p00 = phase(0, 0)
    p01 = phase(0, 1)
    p10 = phase(1, 0)
    p11 = phase(1, 1)
    # Interleave phases: out[:, 2i+ry, 2j+rx] = p{ry}{rx}[:, i, j]
    top = jnp.stack([p00, p01], axis=3).reshape(B, H, 2 * W, Cout)
    bot = jnp.stack([p10, p11], axis=3).reshape(B, H, 2 * W, Cout)
    return jnp.stack([top, bot], axis=2).reshape(B, 2 * H, 2 * W, Cout)
