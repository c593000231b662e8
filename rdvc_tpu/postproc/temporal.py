"""First-order IIR temporal low-pass (decoder stage 4).

Spec: /root/reference/codec_processing.py:1905-1926 —
out = alpha * previous_postprocessed + (1 - alpha) * current, clamped to
[0, 1]; alpha 0 (default) disables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def temporal_iir_filter(
    current: jax.Array, previous: jax.Array, alpha: jax.Array
) -> jax.Array:
    out = alpha * previous + (1.0 - alpha) * current
    return jnp.clip(out, 0.0, 1.0)
