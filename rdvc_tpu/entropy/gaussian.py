"""Gaussian conditional entropy model (the hyperprior's y-coder).

The reference repository *advertises* a hyperprior entropy model (its
README: "Hyperprior Autoencoders for entropy coding"; the architecture
diagram `benchmark/hyperpriorcomponent graph.png`) but its code only ever
instantiates CompressAI's factorized `EntropyBottleneck`
(/root/reference/codec_processing.py:433,447). This module supplies the
advertised capability: latents `y` are coded against per-element Gaussians
N(mu, sigma) predicted by a hyper-synthesis network from a coded
hyper-latent `z` (Balle et al. 2018 scale-hyperprior; Minnen et al. 2018
mean-scale variant).

Coding semantics follow CompressAI's GaussianConditional so the existing
indexed rANS machinery (entropy/rans/coder.py, C++ + Python executable
spec) is reused unchanged:
  - a fixed 64-entry log-spaced scale table (0.11 .. 256);
  - per-element table index = smallest bin whose scale >= sigma;
  - one quantized CDF row per scale bin over the support
    [-max_v .. max_v] with a trailing escape symbol carrying the tail
    (out-of-range symbols bypass-code raw bits, coder.py:102-116);
  - symbols are round(y - mu); dequantization is symbol + mu.

The tables depend ONLY on the fixed scale table — never on checkpoint
params — so encoder/decoder agreement is structural (cf. the factorized
tables, which are rebuilt deterministically from checkpoint params at
load; CLAUDE.md invariants).

TPU note: training-path likelihoods are pure elementwise math (erf), fusing
into the surrounding convs. Inference-side index computation is a
comparison-sum against the 64 constant bin edges (gather-free, the same
trick as the channel-aligned device rANS streams).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rdvc_tpu.entropy.factorized import (
    CdfTables,
    LIKELIHOOD_MIN,
    pmf_to_quantized_cdf,
)

SCALE_MIN = 0.11
SCALE_MAX = 256.0
SCALE_LEVELS = 64


def default_scale_table() -> np.ndarray:
    """CompressAI's default: 64 log-spaced scales in [0.11, 256]."""
    return np.exp(
        np.linspace(np.log(SCALE_MIN), np.log(SCALE_MAX), SCALE_LEVELS)
    )


def _std_normal_cdf(x: np.ndarray) -> np.ndarray:
    from math import sqrt

    from scipy.special import erf  # host-side table build only

    return 0.5 * (1.0 + erf(np.asarray(x, np.float64) / sqrt(2.0)))


def gaussian_likelihood(
    y_hat: jax.Array, means: jax.Array, scales: jax.Array
) -> jax.Array:
    """P(y_hat in the +-0.5 quantization bin) under N(means, scales).

    Matches the factorized bottleneck's convention (difference of CDFs at
    the bin edges, clamped at LIKELIHOOD_MIN). `scales` are clamped to the
    table minimum so the training density never sharpens past what the
    coder can represent.
    """
    scales = jnp.maximum(scales.astype(jnp.float32), SCALE_MIN)
    d = (y_hat.astype(jnp.float32) - means.astype(jnp.float32)) / scales
    inv_sqrt2 = np.float32(1.0 / np.sqrt(2.0))
    half = 0.5 / scales
    upper = 0.5 * (1.0 + jax.lax.erf((d + half) * inv_sqrt2))
    lower = 0.5 * (1.0 + jax.lax.erf((d - half) * inv_sqrt2))
    return jnp.maximum(upper - lower, LIKELIHOOD_MIN)


def scale_indexes(scales, scale_table: np.ndarray | None = None):
    """Per-element CDF-row index: the smallest bin with table >= scale.

    CompressAI semantics (GaussianConditional.build_indexes): start at the
    last bin and subtract 1 for every table entry (except the last) that
    is >= the element's scale. Works on numpy or jax arrays; gather-free
    (a comparison-sum against 63 constants).
    """
    table = (
        default_scale_table() if scale_table is None else scale_table
    )
    xp = jnp if isinstance(scales, jax.Array) else np
    s = xp.maximum(scales, table[0])
    idx = xp.full(s.shape, len(table) - 1, dtype=xp.int32)
    for t in table[:-1]:
        idx = idx - (s <= t).astype(xp.int32)
    return idx


def build_gaussian_cdf_tables(
    scale_table: np.ndarray | None = None,
    tail_mass: float = 1e-9,
    precision: int = 16,
) -> CdfTables:
    """Quantized CDF rows for every scale bin (host, float64,
    deterministic — the GaussianConditional.update() equivalent).

    Row b covers integer symbols v in [-max_v[b] .. max_v[b]] where max_v
    is the smallest support containing all but `tail_mass` of N(0, s_b);
    the trailing escape symbol carries the tail (bypass-coded raw bits for
    out-of-range values, same convention as the factorized tables).
    `medians` are zero: quantization offsets for the Gaussian path are the
    per-element means, applied by the caller.
    """
    table = np.asarray(
        default_scale_table() if scale_table is None else scale_table,
        np.float64,
    )
    # Smallest q with P(|v| > q + 0.5) <= tail_mass  (two-sided).
    from scipy.special import erfinv

    q = erfinv(1.0 - tail_mass) * np.sqrt(2.0)  # std-normal two-sided tail
    max_v = np.maximum(np.ceil(table * q - 0.5), 1).astype(np.int64)
    pmf_length = 2 * max_v + 1
    max_cdf_len = int(pmf_length.max()) + 2

    C = table.shape[0]
    quantized = np.zeros((C, max_cdf_len), np.uint32)
    cdf_length = np.zeros(C, np.int32)
    for b in range(C):
        m = int(max_v[b])
        v = np.arange(-m, m + 1, dtype=np.float64)
        upper = _std_normal_cdf((v + 0.5) / table[b])
        lower = _std_normal_cdf((v - 0.5) / table[b])
        pmf = upper - lower
        tail = 2.0 * _std_normal_cdf(-(m + 0.5) / table[b])
        cdf = pmf_to_quantized_cdf(
            np.concatenate([pmf, [max(tail, 0.0)]]), precision
        )
        quantized[b, : cdf.shape[0]] = cdf
        cdf_length[b] = cdf.shape[0]

    tables = CdfTables(
        quantized_cdf=quantized,
        offset=(-max_v).astype(np.int32),
        cdf_length=cdf_length,
        medians=np.zeros(C, np.float32),
        precision=precision,
    )
    tables.validate()
    return tables


def quantize_gaussian(y: np.ndarray, means: np.ndarray) -> np.ndarray:
    """float latents -> int32 symbols round(y - mu)."""
    return np.round(
        np.asarray(y, np.float64) - np.asarray(means, np.float64)
    ).astype(np.int32)


def dequantize_gaussian(sym: np.ndarray, means: np.ndarray) -> np.ndarray:
    """int32 symbols -> float32 latents (symbol + mu)."""
    return (
        sym.astype(np.float32) + np.asarray(means, np.float32)
    ).astype(np.float32)
