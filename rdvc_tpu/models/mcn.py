"""Motion Compensation Network.

Behavioral spec (/root/reference/codec_processing.py:369-406): input is
cat[warped_ref(3), flow(2), ref(3)] = 8 channels -> k5 conv(base) ->
N x ResidualBlock -> k5 conv(3) -> sigmoid; the output is a multiplicative
mask applied to the warped reference: refined = warped_ref * mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdvc_tpu.models.layers import Conv, ConvNormAct, ResidualBlock


class MotionCompensationNetwork(nn.Module):
    base_channels: int = 32
    num_res_blocks: int = 3
    output_channels: int = 3
    norm: str = "batch"
    act: str = "leaky_relu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        warped_ref: jax.Array,
        flow: jax.Array,
        ref_frame: jax.Array,
        *,
        train: bool = False,
    ) -> jax.Array:
        if warped_ref.shape != ref_frame.shape or warped_ref.shape[1:3] != flow.shape[1:3]:
            raise ValueError(
                f"MCN input mismatch: warped {warped_ref.shape}, "
                f"flow {flow.shape}, ref {ref_frame.shape}"
            )
        x = jnp.concatenate(
            [warped_ref, flow, ref_frame], axis=-1
        ).astype(self.compute_dtype)
        x = ConvNormAct(
            self.base_channels, kernel_size=5, stride=1,
            norm=self.norm, act=self.act, compute_dtype=self.compute_dtype,
        )(x, train=train)
        for _ in range(self.num_res_blocks):
            x = ResidualBlock(
                self.base_channels, norm=self.norm, act=self.act,
                compute_dtype=self.compute_dtype,
            )(x, train=train)
        x = Conv(
            self.output_channels, kernel_size=5, stride=1,
            compute_dtype=self.compute_dtype, out_dtype=jnp.float32,
        )(x)
        mask = nn.sigmoid(x)
        return warped_ref.astype(jnp.float32) * mask
