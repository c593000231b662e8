"""NN building blocks (flax.linen, NHWC, TPU-native).

Behavioral spec from the reference blocks
(/root/reference/codec_processing.py:101-217): Conv->BatchNorm->LeakyReLU(0.2)
stacks with conv bias disabled under a norm, transposed-conv 2x upsampling,
and a pre-activation-free residual block. Layout is NHWC (TPU-native) rather
than the reference's NCHW, and convolutions run in bf16 on the MXU with fp32
params/norm statistics.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdvc_tpu.ops.mmconv import (
    conv2d_mm,
    conv_transpose2d_mm,
    use_mm_conv,
)


class _MMConv(nn.Module):
    """Drop-in conv computed via MXU matmuls (ops/mmconv.py): XLA's native
    conv lowering runs at ~2-7% MFU on the target chip while its matmul
    path reaches ~49%. Same param names/shapes/init as nn.Conv, so
    checkpoints are interchangeable (instantiated with name='Conv_0')."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            self.param_dtype,
        )
        (ph, _), (pw, _) = self.padding
        y = conv2d_mm(
            x.astype(self.dtype), kernel.astype(self.dtype),
            stride=tuple(self.strides), padding=(ph, pw),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(),
                (self.features,), self.param_dtype,
            )
            y = y + bias
        return y.astype(self.dtype)


class _MMConvTranspose(nn.Module):
    """Drop-in 2x up-conv (k3 s2 'SAME') via the mmconv phase
    decomposition; param-compatible with nn.ConvTranspose
    (instantiated with name='ConvTranspose_0')."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            self.param_dtype,
        )
        y = conv_transpose2d_mm(
            x.astype(self.dtype), kernel.astype(self.dtype)
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(),
                (self.features,), self.param_dtype,
            )
            y = y + bias
        return y.astype(self.dtype)


def get_activation(name: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    """Activation registry (reference codec_processing.py:101-114)."""
    name = (name or "none").lower()
    table = {
        "none": lambda x: x,
        "relu": nn.relu,
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
        "gelu": nn.gelu,
        "sigmoid": nn.sigmoid,
        "tanh": nn.tanh,
        "softplus": nn.softplus,
    }
    if name not in table:
        raise ValueError(f"Unknown activation function: {name}")
    return table[name]


class GDN(nn.Module):
    """Generalized Divisive Normalization (optional variant; the reference
    transforms use BatchNorm, codec_processing.py:125-126)."""

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        beta = self.param("beta", lambda k: jnp.ones((c,), jnp.float32))
        gamma = self.param(
            "gamma", lambda k: self.gamma_init * jnp.eye(c, dtype=jnp.float32)
        )
        beta = jnp.maximum(beta, self.beta_min)
        gamma = jnp.abs(gamma)
        norm = jnp.einsum("bhwc,cd->bhwd", jnp.square(x.astype(jnp.float32)), gamma)
        norm = jnp.sqrt(norm + beta)
        out = x * norm if self.inverse else x / norm
        return out.astype(x.dtype)


def _make_norm(norm: str, train: bool):
    if norm == "batch":
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
        )
    if norm == "gdn":
        return GDN()
    if norm == "igdn":
        return GDN(inverse=True)
    if norm == "none" or norm is None:
        return None
    raise ValueError(f"Unknown norm: {norm}")


class ConvNormAct(nn.Module):
    """Conv -> Norm -> Act (reference ConvNormAct, codec_processing.py:116-156).

    'same' padding == k//2 on both sides (reference semantics); conv bias is
    disabled when a norm with affine parameters follows.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "batch"
    act: Optional[str] = "leaky_relu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        pad = self.kernel_size // 2
        use_bias = self.norm in (None, "none")
        if use_mm_conv():
            y = _MMConv(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=use_bias,
                dtype=self.compute_dtype,
                name="Conv_0",
            )(x)
        else:
            y = nn.Conv(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=use_bias,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="Conv_0",
            )(x)
        norm = _make_norm(self.norm, train)
        if norm is not None:
            y = norm(y.astype(jnp.float32)).astype(self.compute_dtype)
        if self.act is not None:
            y = get_activation(self.act)(y)
        return y


class ConvTransposeNormAct(nn.Module):
    """ConvTranspose(k3,s2) 2x upsample -> Norm -> Act
    (reference ConvTransposeNormAct, codec_processing.py:158-188:
    ConvTranspose2d(k=3, s=2, p=1, output_padding=1) => out = 2*in)."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    norm: str = "batch"
    act: Optional[str] = "leaky_relu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = self.norm in (None, "none")
        # torch ConvTranspose2d(k, s, p, op): out = (in-1)*s - 2p + k + op.
        # For k=3,s=2,p=1,op=1 that is exactly 2*in == XLA 'SAME' transpose.
        if (
            use_mm_conv()
            and self.kernel_size == 3
            and self.stride == 2
        ):
            y = _MMConvTranspose(
                features=self.features,
                use_bias=use_bias,
                dtype=self.compute_dtype,
                name="ConvTranspose_0",
            )(x)
        else:
            y = nn.ConvTranspose(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding="SAME",
                use_bias=use_bias,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="ConvTranspose_0",
            )(x)
        norm = _make_norm(self.norm, train)
        if norm is not None:
            y = norm(y.astype(jnp.float32)).astype(self.compute_dtype)
        if self.act is not None:
            y = get_activation(self.act)(y)
        return y


class ResidualBlock(nn.Module):
    """ConvNormAct -> ConvNorm(no act) -> +identity -> act
    (reference ResidualBlock, codec_processing.py:190-217)."""

    channels: int
    kernel_size: int = 3
    norm: str = "batch"
    act: str = "leaky_relu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        y = ConvNormAct(
            self.channels, self.kernel_size, 1, self.norm, self.act,
            compute_dtype=self.compute_dtype,
        )(x, train=train)
        y = ConvNormAct(
            self.channels, self.kernel_size, 1, self.norm, None,
            compute_dtype=self.compute_dtype,
        )(y, train=train)
        y = y + x
        return get_activation(self.act)(y)


class Conv(nn.Module):
    """Plain conv with 'same' padding and bias (reference's bare nn.Conv2d
    uses, e.g. the final latent/output convs, codec_processing.py:252-262)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16
    out_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.kernel_size // 2
        if use_mm_conv():
            y = _MMConv(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=True,
                dtype=self.compute_dtype,
                name="Conv_0",
            )(x)
        else:
            y = nn.Conv(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=True,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="Conv_0",
            )(x)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y
