"""Image quality metrics in JAX: PSNR, SSIM, MS-SSIM.

Behavioral spec: the reference evaluates with skimage PSNR/SSIM
(/root/reference/test_2frames.py:46-47,563-590) and pytorch_msssim MS-SSIM
(/root/reference/test_uvg.py:34, new_train.py:83). SSIM here supports both
skimage's default uniform window and the gaussian 11x11/1.5 variant used by
(MS-)SSIM losses; MS-SSIM follows the standard Wang et al. 5-scale weights.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """PSNR in dB over all axes except the leading batch axis."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    axes = tuple(range(1, a.ndim))
    mse = jnp.mean(jnp.square(a - b), axis=axes)
    mse = jnp.maximum(mse, 1e-12)
    return 10.0 * jnp.log10((data_range ** 2) / mse)


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return g.astype(np.float32)


def _filter2d_separable(x: jax.Array, kernel_1d: jax.Array) -> jax.Array:
    """Valid-mode separable filter on (B, H, W, C)."""
    k = kernel_1d.shape[0]
    C = x.shape[-1]
    # Depthwise HWIO kernels: (k, 1, 1, C) with feature_group_count=C.
    kh = jnp.tile(kernel_1d.reshape(k, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(kernel_1d.reshape(1, k, 1, 1), (1, 1, 1, C))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    # HIGHEST precision: TPU convs default to bf16 multiplies, which puts
    # ~1e-2 error into the SSIM moment maps (observed MS-SSIM > 1.0 at
    # 1080p). Metrics must be exact; their speed is irrelevant.
    y = jax.lax.conv_general_dilated(
        x, kh.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )
    dn2 = jax.lax.conv_dimension_numbers(y.shape, kw.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        y, kw.astype(y.dtype), (1, 1), "VALID",
        dimension_numbers=dn2, feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )


def _ssim_maps(
    a: jax.Array,
    b: jax.Array,
    kernel_1d: jax.Array,
    data_range: float,
    k1: float = 0.01,
    k2: float = 0.03,
):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = _filter2d_separable(a, kernel_1d)
    mu_b = _filter2d_separable(b, kernel_1d)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _filter2d_separable(a * a, kernel_1d) - mu_aa
    sigma_bb = _filter2d_separable(b * b, kernel_1d) - mu_bb
    sigma_ab = _filter2d_separable(a * b, kernel_1d) - mu_ab
    cs = (2.0 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    lum = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    return lum * cs, cs


def ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
    gaussian: bool = False,
    sigma: float = 1.5,
) -> jax.Array:
    """SSIM over (B, H, W, C); defaults match skimage (uniform 7x7 window).

    With gaussian=True and win_size=11 it matches the usual SSIM-loss
    formulation (pytorch_msssim).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if gaussian:
        kern = jnp.asarray(_gaussian_kernel(win_size, sigma))
    else:
        kern = jnp.full((win_size,), 1.0 / win_size, jnp.float32)
    ssim_map, _ = _ssim_maps(a, b, kern, data_range)
    return jnp.mean(ssim_map, axis=tuple(range(1, ssim_map.ndim)))


def ms_ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    weights: Sequence[float] = _MSSSIM_WEIGHTS,
) -> jax.Array:
    """Multi-scale SSIM on (B, H, W, C), pytorch_msssim-compatible.

    5 scales, 2x average-pool between scales, relu on per-scale cs values.
    Requires min(H, W) > (win_size-1) * 2**(len(weights)-1).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    kern = jnp.asarray(_gaussian_kernel(win_size, sigma))
    w = jnp.asarray(weights, jnp.float32)
    levels = len(weights)
    cs_vals = []
    for i in range(levels):
        ssim_map, cs_map = _ssim_maps(a, b, kern, data_range)
        axes = tuple(range(1, ssim_map.ndim))
        if i < levels - 1:
            cs_vals.append(jax.nn.relu(jnp.mean(cs_map, axis=axes)))
            pad_h = a.shape[1] % 2
            pad_w = a.shape[2] % 2
            if pad_h or pad_w:
                a = a[:, : a.shape[1] - pad_h, : a.shape[2] - pad_w]
                b = b[:, : b.shape[1] - pad_h, : b.shape[2] - pad_w]
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        else:
            ssim_last = jax.nn.relu(jnp.mean(ssim_map, axis=axes))
    result = ssim_last ** w[-1]
    for i, cs in enumerate(cs_vals):
        result = result * (cs ** w[i])
    return result
