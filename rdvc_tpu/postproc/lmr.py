"""Low-motion region replacement (decoder stage 2).

Spec: /root/reference/codec_processing.py:1850-1882 — where the decoded flow
magnitude sqrt(u^2+v^2) falls below a threshold, replace pixels with the
latest decoded I-frame (default threshold 0 disables the stage).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def low_motion_replacement(
    frame: jax.Array,      # (1, H, W, 3) current reconstruction
    flow: jax.Array,       # (1, H, W, 2) decoded flow
    iframe: jax.Array,     # (1, H, W, 3) latest decoded I-frame
    threshold: jax.Array,  # scalar; <= 0 disables
) -> Tuple[jax.Array, jax.Array]:
    """Returns (frame_out, mask) where mask marks replaced pixels."""
    mag = jnp.sqrt(
        jnp.square(flow[..., 0]) + jnp.square(flow[..., 1])
    )  # (1, H, W)
    active = threshold > 0.0
    mask = jnp.logical_and(mag < threshold, active)
    out = jnp.where(mask[..., None], iframe, frame)
    return out, mask
