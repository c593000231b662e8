"""All-pairs correlation volume + pyramid lookup (the RAFT hot path).

Spec: RAFT's 4D correlation volume C[i, j] = <f1_i, f2_j> / sqrt(D) over all
pixel pairs at 1/8 resolution, a 4-level pyramid (2x average pooling over
the *second* frame's spatial dims), and per-iteration bilinear lookup of an
r=4 neighborhood (81 points) at each pyramid level around the current flow
target coordinates.

TPU-native formulation:
  * the volume is one big batched matmul (B, HW, C) x (B, C, HW) on the MXU;
  * the pyramid is reduce_window average pooling over a (B*HW, H2, W2, 1)
    view;
  * the lookup is a vectorized 4-tap bilinear gather; all 81 offsets are
    sampled at once per level so XLA emits a handful of fused gathers per
    iteration instead of 81.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def build_corr_pyramid(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
    use_pallas: bool = False,
) -> List[jax.Array]:
    """fmap1/fmap2: (B, H, W, C) 1/8-res features ->
    [(B*H*W, H/2^l, W/2^l, 1)] correlation pyramid.

    use_pallas=True routes to the fused Pallas kernel
    (models/raft/pallas_corr.py): one MXU pass computes the volume and all
    pooled levels without re-reading the volume from HBM — the blockwise
    variant for larger working resolutions (SURVEY.md hard-part 3)."""
    if use_pallas and num_levels == 4:
        from rdvc_tpu.models.raft.pallas_corr import corr_pyramid_pallas

        return corr_pyramid_pallas(fmap1, fmap2)
    B, H, W, C = fmap1.shape
    # Keep the features' dtype (bf16 from the encoders — MXU-native); fp32
    # accumulation via preferred_element_type. HIGHEST precision only
    # affects fp32 inputs (e.g. the CPU test path); bf16 stays single-pass.
    f1 = fmap1.reshape(B, H * W, C)
    f2 = fmap2.reshape(B, H * W, C)
    corr = jnp.einsum(
        "bnc,bmc->bnm",
        f1,
        f2,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(C))
    corr = corr.reshape(B * H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = jax.lax.reduce_window(
            corr, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        pyramid.append(corr)
    return pyramid


def _axis_weights(
    centers: jax.Array, radius: int, size: int
) -> jax.Array:
    """Bilinear sampling weights along one axis, as a dense matrix.

    centers: (N,) center coordinate per row. Sample positions are
    centers + {-r..r}; returns (N, 2r+1, size) weights such that
    W @ values == bilinear samples with zero padding outside [0, size-1].
    """
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    pos = centers[:, None] + d[None, :]            # (N, K)
    p0 = jnp.floor(pos)
    frac = pos - p0                                # shared fractional part
    grid = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    w0 = (1.0 - frac)[..., None] * (grid == p0[..., None])
    w1 = frac[..., None] * (grid == (p0[..., None] + 1.0))
    # Out-of-range taps contribute 0 automatically: the equality against the
    # in-range grid never fires for p0 outside [0, size-1].
    return w0 + w1                                 # (N, K, size)


def corr_lookup(
    pyramid: List[jax.Array],
    coords: jax.Array,
    radius: int = 4,
) -> jax.Array:
    """Sample an r-neighborhood at every pyramid level.

    TPU formulation: all (2r+1)^2 sample points at a level share one
    fractional offset (the integer displacement grid), so the bilinear
    lookup is SEPARABLE: samples = Ry @ vol @ Cx^T with small dense weight
    matrices. Two batched matmuls per level on the MXU — no per-element
    gathers (TPU gathers serialize; this was the RAFT hot-path bottleneck).

    Args:
      pyramid: list of (B*H*W, H_l, W_l, 1) volumes (level 0 first).
      coords: (B, H, W, 2) current target coordinates (x, y) in level-0
        pixel units.
    Returns:
      (B, H, W, num_levels * (2r+1)^2) correlation features.
    """
    B, H, W, _ = coords.shape
    N = B * H * W
    K = 2 * radius + 1
    cx = coords[..., 0].reshape(N).astype(jnp.float32)
    cy = coords[..., 1].reshape(N).astype(jnp.float32)

    out = []
    for lvl, vol in enumerate(pyramid):
        scale = 1.0 / (2 ** lvl)
        _, H2, W2, _ = vol.shape
        ry = _axis_weights(cy * scale, radius, H2)   # (N, K, H2)
        cxw = _axis_weights(cx * scale, radius, W2)  # (N, K, W2)
        v = vol[..., 0]                              # (N, H2, W2)
        rows = jnp.einsum(
            "nkh,nhw->nkw", ry, v.astype(jnp.float32)
        )                                            # (N, K, W2)
        patch = jnp.einsum("nkw,nqw->nkq", rows, cxw)  # (N, K, K) [y, x]
        out.append(patch.reshape(N, K * K))
    feats = jnp.concatenate(out, axis=1)  # (N, L*K*K)
    return feats.reshape(B, H, W, -1)
