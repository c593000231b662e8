"""RAFT feature/context encoders (flax, NHWC).

Behavioral spec: RAFT (Teed & Deng, arXiv 2003.12039; see PAPERS.md) as
invoked by the reference through torchvision's raft_large
(/root/reference/codec_processing.py:48-82, 1436-1444): a residual CNN
producing 256-d features at 1/8 resolution. The feature encoder uses
instance norm; the context encoder batch norm, with its output split into a
tanh'd hidden state and relu'd context features.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over H, W with affine params."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


def _norm(kind: str, train: bool):
    if kind == "instance":
        return InstanceNorm()
    if kind == "batch":
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )
    if kind == "none":
        return None
    raise ValueError(kind)


class RaftResBlock(nn.Module):
    """RAFT residual unit: two 3x3 conv+norm+relu with a strided projection
    shortcut when shape changes."""

    features: int
    stride: int = 1
    norm: str = "instance"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        y = nn.Conv(
            self.features, (3, 3), (self.stride, self.stride),
            padding=((1, 1), (1, 1)), dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)
        n1 = _norm(self.norm, train)
        if n1 is not None:
            y = n1(y.astype(jnp.float32)).astype(self.compute_dtype)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
            dtype=self.compute_dtype, param_dtype=jnp.float32,
        )(y)
        n2 = _norm(self.norm, train)
        if n2 is not None:
            y = n2(y.astype(jnp.float32)).astype(self.compute_dtype)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(
                self.features, (1, 1), (self.stride, self.stride),
                dtype=self.compute_dtype, param_dtype=jnp.float32,
            )(x)
            n3 = _norm(self.norm, train)
            if n3 is not None:
                x = n3(x.astype(jnp.float32)).astype(self.compute_dtype)
        return nn.relu(x + y)


class RaftEncoder(nn.Module):
    """Stem conv7x7 s2 -> 3 stages of 2 residual blocks (s1, s2, s2) ->
    1x1 output conv. Output is 1/8 resolution, `output_dim` channels."""

    output_dim: int = 256
    stage_dims: Sequence[int] = (64, 96, 128)
    norm: str = "instance"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(self.compute_dtype)
        x = nn.Conv(
            self.stage_dims[0], (7, 7), (2, 2), padding=((3, 3), (3, 3)),
            dtype=self.compute_dtype, param_dtype=jnp.float32,
        )(x)
        n = _norm(self.norm, train)
        if n is not None:
            x = n(x.astype(jnp.float32)).astype(self.compute_dtype)
        x = nn.relu(x)
        for i, dim in enumerate(self.stage_dims):
            stride = 1 if i == 0 else 2
            x = RaftResBlock(
                dim, stride=stride, norm=self.norm,
                compute_dtype=self.compute_dtype,
            )(x, train=train)
            x = RaftResBlock(
                dim, stride=1, norm=self.norm, compute_dtype=self.compute_dtype
            )(x, train=train)
        x = nn.Conv(
            self.output_dim, (1, 1), dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)
        return x
