"""RAFT update machinery: motion encoder, SepConvGRU, flow/mask heads,
convex upsampling (spec: RAFT paper §3.3; torchvision raft_large layout)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _conv(features, k, dtype):
    pad = k // 2
    return nn.Conv(
        features, (k, k), padding=((pad, pad), (pad, pad)),
        dtype=dtype, param_dtype=jnp.float32,
    )


class MotionEncoder(nn.Module):
    """Encodes correlation features + current flow into motion features.

    corr -> 1x1(256) -> relu -> 3x3(192) -> relu
    flow -> 7x7(128) -> relu -> 3x3(64) -> relu
    cat  -> 3x3(126) -> relu; output = cat(features, flow) => 128 ch.
    """

    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, flow: jax.Array, corr: jax.Array) -> jax.Array:
        c = corr.astype(self.compute_dtype)
        f = flow.astype(self.compute_dtype)
        c = nn.relu(_conv(256, 1, self.compute_dtype)(c))
        c = nn.relu(_conv(192, 3, self.compute_dtype)(c))
        f2 = nn.relu(_conv(128, 7, self.compute_dtype)(f))
        f2 = nn.relu(_conv(64, 3, self.compute_dtype)(f2))
        x = jnp.concatenate([c, f2], axis=-1)
        x = nn.relu(_conv(126, 3, self.compute_dtype)(x))
        return jnp.concatenate([x, f], axis=-1)  # 128 channels


class SepConvGRU(nn.Module):
    """Separable ConvGRU: a 1x5 GRU pass then a 5x1 GRU pass (hidden 128)."""

    hidden_dim: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        h = h.astype(self.compute_dtype)
        x = x.astype(self.compute_dtype)
        for kh, kw in ((1, 5), (5, 1)):
            hx = jnp.concatenate([h, x], axis=-1)
            pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))

            def conv(name):
                return nn.Conv(
                    self.hidden_dim, (kh, kw), padding=pad,
                    dtype=self.compute_dtype, param_dtype=jnp.float32,
                    name=name,
                )

            z = nn.sigmoid(conv(f"convz_{kh}x{kw}")(hx))
            r = nn.sigmoid(conv(f"convr_{kh}x{kw}")(hx))
            q = nn.tanh(
                conv(f"convq_{kh}x{kw}")(jnp.concatenate([r * h, x], axis=-1))
            )
            h = (1.0 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        x = nn.relu(_conv(256, 3, self.compute_dtype)(h.astype(self.compute_dtype)))
        return _conv(2, 3, self.compute_dtype)(x).astype(jnp.float32)


class MaskHead(nn.Module):
    """Predicts 8x8x9 convex-combination weights for upsampling."""

    upsample_factor: int = 8
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        x = nn.relu(_conv(256, 3, self.compute_dtype)(h.astype(self.compute_dtype)))
        n = self.upsample_factor * self.upsample_factor * 9
        # 0.25 scaling stabilizes the softmax logits (RAFT reference trick).
        return (_conv(n, 1, self.compute_dtype)(x) * 0.25).astype(jnp.float32)


class UpdateBlock(nn.Module):
    """One RAFT iteration: motion features -> GRU -> (delta_flow, mask)."""

    hidden_dim: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = MotionEncoder(compute_dtype=self.compute_dtype)
        self.gru = SepConvGRU(
            hidden_dim=self.hidden_dim, compute_dtype=self.compute_dtype
        )
        self.flow_head = FlowHead(compute_dtype=self.compute_dtype)
        self.mask_head = MaskHead(compute_dtype=self.compute_dtype)

    def __call__(
        self,
        hidden: jax.Array,
        context: jax.Array,
        corr: jax.Array,
        flow: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        motion = self.encoder(flow, corr)
        inp = jnp.concatenate([context, motion], axis=-1)
        hidden = self.gru(hidden, inp)
        delta = self.flow_head(hidden)
        mask = self.mask_head(hidden)
        return hidden, delta, mask


def convex_upsample(flow: jax.Array, mask: jax.Array, factor: int = 8) -> jax.Array:
    """Convex-combination upsampling (RAFT §3.3).

    flow: (B, H, W, 2) coarse flow; mask: (B, H, W, factor*factor*9).
    Returns (B, H*factor, W*factor, 2) with flow values scaled by factor.
    """
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 9, factor * factor)
    m = jax.nn.softmax(m, axis=3)
    # 3x3 neighborhoods of the (scaled) coarse flow, zero-padded.
    fpad = jnp.pad(
        flow * factor, ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    patches = []
    for dy in range(3):
        for dx in range(3):
            patches.append(fpad[:, dy : dy + H, dx : dx + W, :])
    nb = jnp.stack(patches, axis=3)  # (B, H, W, 9, 2)
    up = jnp.einsum(
        "bhwks,bhwkc->bhwsc", m, nb, precision=jax.lax.Precision.HIGHEST
    )  # (B,H,W,f*f,2)
    up = up.reshape(B, H, W, factor, factor, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B,H,f,W,f,2)
    return up.reshape(B, H * factor, W * factor, 2)
