"""Hyper-analysis / hyper-synthesis transforms (mean-scale hyperprior).

The reference advertises "Hyperprior Autoencoders for entropy coding"
(its README + `benchmark/hyperpriorcomponent graph.png`) but ships only
the factorized bottleneck (/root/reference/codec_processing.py:433,447).
These modules supply the advertised design as an opt-in model variant
(`ModelConfig.hyperprior = True`): each AE's latents `y` gain a coded
hyper-latent `z = h_a(y)` (factorized-bottleneck coded) from which
`h_s(z_hat)` predicts per-element (mu, sigma) for the Gaussian
conditional coder (entropy/gaussian.py).

Architecture follows the Minnen et al. 2018 mean-scale layout: two
stride-2 downsampling convs (z is 1/4 of the latent resolution, i.e.
1/32 of the frame), mirrored transposed convs up, and a 2C-channel head
split into means and raw scales. No normalization layers (matching
CompressAI hyper transforms) — which also keeps these modules exactly
invariant under the runtime's BatchNorm-folding rewrite (models/fold.py
passes norm-free scopes through unchanged).

sigma = SCALE_MIN + softplus(raw): smooth, bounded below by the scale
table's smallest bin, unbounded above (indexes clamp to the last bin).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdvc_tpu.entropy.gaussian import SCALE_MIN
from rdvc_tpu.models.layers import Conv, ConvNormAct, ConvTransposeNormAct


class HyperAnalysis(nn.Module):
    """y (B, h, w, C) -> z (B, ~h/4, ~w/4, hyper_channels)."""

    hyper_channels: int
    act: str = "leaky_relu"

    @nn.compact
    def __call__(self, y: jax.Array, *, train: bool = False) -> jax.Array:
        x = ConvNormAct(
            self.hyper_channels, kernel_size=3, stride=1,
            norm="none", act=self.act,
        )(y, train=train)
        x = ConvNormAct(
            self.hyper_channels, kernel_size=5, stride=2,
            norm="none", act=self.act,
        )(x, train=train)
        x = Conv(
            self.hyper_channels, kernel_size=5, stride=2,
            out_dtype=jnp.float32,
        )(x)
        return x


class HyperSynthesis(nn.Module):
    """z_hat (B, zh, zw, hyper) -> (mu, sigma), each (B, h, w, C).

    Output is cropped to `target_hw` (the latent's (h, w)): the stride-2
    transposes produce 4*zh >= h rows for any h, so a slice recovers the
    exact latent grid without dynamic shapes.
    """

    latent_channels: int
    hyper_channels: int
    act: str = "leaky_relu"

    @nn.compact
    def __call__(
        self, z_hat: jax.Array, target_hw: Tuple[int, int],
        *, train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        h, w = int(target_hw[0]), int(target_hw[1])
        x = ConvTransposeNormAct(
            self.hyper_channels, norm="none", act=self.act,
        )(z_hat, train=train)
        x = ConvTransposeNormAct(
            self.hyper_channels * 3 // 2, norm="none", act=self.act,
        )(x, train=train)
        x = Conv(
            2 * self.latent_channels, kernel_size=3, stride=1,
            out_dtype=jnp.float32,
        )(x)
        x = x[:, :h, :w, :]
        mu = x[..., : self.latent_channels]
        raw = x[..., self.latent_channels :]
        sigma = SCALE_MIN + jax.nn.softplus(raw)
        return mu, sigma
