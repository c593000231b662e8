"""Analysis/synthesis transforms (the motion & residual autoencoders).

Behavioral spec from the reference Encoder/Decoder
(/root/reference/codec_processing.py:219-320):

Encoder:  k5s1 stem -> N x (k3 s2 downsample, channels double)
          -> M x ResidualBlock -> k3s1 conv to latent (no norm/act).
Decoder:  k3s1 from latent to base*2^N channels -> M x ResidualBlock
          -> N x ConvTranspose (channels halve, 2x upsample)
          -> k5s1 output conv -> optional final activation.

Defaults N=3 (8x downsample), M=2. NHWC, bf16 compute.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdvc_tpu.models.layers import (
    Conv,
    ConvNormAct,
    ConvTransposeNormAct,
    ResidualBlock,
    get_activation,
)


class AnalysisTransform(nn.Module):
    """Encoder: image/flow -> latent."""

    latent_channels: int = 128
    base_channels: int = 64
    num_downsample_layers: int = 3
    num_res_blocks: int = 2
    norm: str = "batch"
    act: str = "leaky_relu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(self.compute_dtype)
        x = ConvNormAct(
            self.base_channels, kernel_size=5, stride=1,
            norm=self.norm, act=self.act, compute_dtype=self.compute_dtype,
        )(x, train=train)
        ch = self.base_channels
        for _ in range(self.num_downsample_layers):
            ch *= 2
            x = ConvNormAct(
                ch, kernel_size=3, stride=2,
                norm=self.norm, act=self.act, compute_dtype=self.compute_dtype,
            )(x, train=train)
        for _ in range(self.num_res_blocks):
            x = ResidualBlock(
                ch, norm=self.norm, act=self.act, compute_dtype=self.compute_dtype
            )(x, train=train)
        x = Conv(
            self.latent_channels, kernel_size=3, stride=1,
            compute_dtype=self.compute_dtype, out_dtype=jnp.float32,
        )(x)
        return x


class SynthesisTransform(nn.Module):
    """Decoder: latent -> image/flow."""

    output_channels: int = 3
    base_channels: int = 64
    num_upsample_layers: int = 3
    num_res_blocks: int = 2
    final_activation: Optional[str] = None
    norm: str = "batch"
    act: str = "leaky_relu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, y: jax.Array, *, train: bool = False) -> jax.Array:
        y = y.astype(self.compute_dtype)
        ch = self.base_channels * (2 ** self.num_upsample_layers)
        y = ConvNormAct(
            ch, kernel_size=3, stride=1,
            norm=self.norm, act=self.act, compute_dtype=self.compute_dtype,
        )(y, train=train)
        for _ in range(self.num_res_blocks):
            y = ResidualBlock(
                ch, norm=self.norm, act=self.act, compute_dtype=self.compute_dtype
            )(y, train=train)
        for _ in range(self.num_upsample_layers):
            ch //= 2
            y = ConvTransposeNormAct(
                ch, kernel_size=3, stride=2,
                norm=self.norm, act=self.act, compute_dtype=self.compute_dtype,
            )(y, train=train)
        y = Conv(
            self.output_channels, kernel_size=5, stride=1,
            compute_dtype=self.compute_dtype, out_dtype=jnp.float32,
        )(y)
        if self.final_activation:
            y = get_activation(self.final_activation)(y)
        return y
