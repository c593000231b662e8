"""Pallas kernel: fused all-pairs correlation volume + pyramid.

Computes RAFT's correlation volume C[q, k] = <f1_q, f2_k>/sqrt(D) AND its
4-level average-pooled pyramid in one MXU pass per query tile: all of f2
stays resident in VMEM, the tile's correlation map is pooled in-register,
and every pyramid level is written to HBM exactly once (the XLA formulation
in corr.py materializes the volume and re-reads it for each pooling step).

Mosaic cannot split a vector's lane dimension in-register, so the kernel
works key-major — corr_t[k, q] with queries on lanes — which makes the
(H*W) -> (H, W) reshape a major-dim split (supported) and the 2x2 pooling a
sublane-strided mean. Outputs are produced key-major and transposed back to
the lookup's query-major layout by XLA afterwards.

Opt-in via build_corr_pyramid(..., use_pallas=True) / RAFT(use_pallas=True);
the XLA path remains the default at the reference's 46x80 working
resolution where the volume fits comfortably.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_TILE = 128
NUM_LEVELS = 4


@functools.partial(jax.jit, static_argnames=("interpret",))
def corr_pyramid_pallas(
    fmap1: jax.Array, fmap2: jax.Array, interpret: bool = False
) -> List[jax.Array]:
    """fmap1/fmap2: (B, H, W, C) -> [(B*H*W, H_l, W_l, 1)] x NUM_LEVELS.

    Matches corr.py:build_corr_pyramid numerically (fp32 accumulation,
    floor-mode 2x2 average pooling).
    """
    B, H, W, C = fmap1.shape
    n = H * W
    n_pad = -(-n // QUERY_TILE) * QUERY_TILE
    f1 = fmap1.reshape(B, n, C)
    if n_pad != n:
        f1 = jnp.pad(f1, ((0, 0), (0, n_pad - n), (0, 0)))
    f2 = fmap2.reshape(B, n, C)

    shapes = []
    h, w = H, W
    for _ in range(NUM_LEVELS):
        shapes.append((h, w))
        h, w = h // 2, w // 2

    grid = (B, n_pad // QUERY_TILE)
    # Key-major outputs: (tiles * hw_pad, QUERY_TILE); each level's
    # flattened spatial size is padded to a multiple of 8 (Mosaic requires
    # sublane-divisible block shapes).
    def _pad8(v: int) -> int:
        return -(-v // 8) * 8

    hw_pads = [_pad8(hl * wl) for hl, wl in shapes]
    out_shape = [
        jax.ShapeDtypeStruct(
            (B * (n_pad // QUERY_TILE) * hwp, QUERY_TILE), jnp.float32
        )
        for hwp in hw_pads
    ]
    in_specs = [
        pl.BlockSpec(
            (1, QUERY_TILE, C), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, n, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    tiles = n_pad // QUERY_TILE
    out_specs = [
        pl.BlockSpec(
            (hwp, QUERY_TILE),
            lambda b, i: (b * tiles + i, 0),
            memory_space=pltpu.VMEM,
        )
        for hwp in hw_pads
    ]

    inv_sqrt_c = 1.0 / (C ** 0.5)

    def kernel(f1_ref, f2_ref, *outs):
        # corr_t[k, q] = <f2_k, f1_q> / sqrt(C): queries live on lanes.
        corr_t = jax.lax.dot_general(
            f2_ref[0],
            f1_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_c
        def write(out_ref, flat, hw, hwp):
            if hwp != hw:
                flat = jnp.pad(flat, ((0, hwp - hw), (0, 0)))
            out_ref[:] = flat

        h0, w0 = shapes[0]
        level = corr_t.reshape(h0, w0, QUERY_TILE)
        write(outs[0], corr_t, h0 * w0, hw_pads[0])
        for l in range(1, len(outs)):
            hl, wl = shapes[l]
            # 2x2 average pool via stepwise major-dim reshapes + static
            # indexing (Mosaic supports neither 5-D pooled reshapes nor
            # strided gathers; the lane dim stays intact throughout).
            lh = level[: hl * 2, : wl * 2].reshape(hl, 2, wl * 2, QUERY_TILE)
            a = lh[:, 0] + lh[:, 1]  # (hl, wl*2, Q)
            aw = a.reshape(hl, wl, 2, QUERY_TILE)
            level = (aw[:, :, 0] + aw[:, :, 1]) * 0.25
            write(
                outs[l], level.reshape(hl * wl, QUERY_TILE),
                hl * wl, hw_pads[l],
            )

    levels = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(f1, f2)

    # Key-major -> query-major (one cheap XLA transpose per level), strip
    # query + spatial padding, restore (B*H*W, H_l, W_l, 1).
    result = []
    for lvl, (hl, wl), hwp in zip(levels, shapes, hw_pads):
        lvl = lvl.reshape(B, tiles, hwp, QUERY_TILE)[:, :, : hl * wl]
        lvl = lvl.transpose(0, 1, 3, 2).reshape(B, n_pad, hl, wl)[:, :n]
        result.append(lvl.reshape(B * n, hl, wl, 1))
    return result
