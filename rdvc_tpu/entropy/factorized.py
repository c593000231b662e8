"""Learned factorized entropy bottleneck (JAX) + quantized-CDF export.

Behavioral contract from the reference's use of CompressAI's
EntropyBottleneck (/root/reference/codec_processing.py:28,462-500 and
new_train.py:44,257,277): a per-channel learned univariate density built from
a stack of small monotone transforms; the training path returns
(y + U(-0.5, 0.5), likelihoods); `update()` bakes the density into quantized
integer CDF tables consumed by a host-side rANS coder; compress/decompress
quantize relative to the learned per-channel medians.

This is a fresh JAX implementation (density math follows Ballé et al. 2018,
"Variational image compression with a scale hyperprior", appendix 6.1).
Tables are built deterministically on host in float64 so encoder and decoder
always agree regardless of accelerator.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LIKELIHOOD_MIN = 1e-9  # reference clamps likelihoods at 1e-9 (new_train.py:234)


def _matrix_init_value(scale: float, fan_out: int) -> float:
    # softplus(H) starts at 1/(scale * fan_out) so the initial CDF spans
    # roughly [-init_scale, init_scale].
    return float(np.log(np.expm1(1.0 / scale / fan_out)))


class FactorizedEntropyBottleneck(nn.Module):
    """Per-channel learned factorized prior.

    Call returns (y_hat, likelihoods) for NHWC latents (channels last).
    """

    channels: int
    filters: Sequence[int] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        filters = (1,) + tuple(self.filters) + (1,)
        k = len(self.filters) + 1
        scale = self.init_scale ** (1.0 / k)
        matrices = []
        biases = []
        factors = []
        for i in range(k):
            d_in, d_out = filters[i], filters[i + 1]
            init = _matrix_init_value(scale, d_out)
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda key, s=(self.channels, d_out, d_in), v=init: jnp.full(
                        s, v, jnp.float32
                    ),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda key, s=(self.channels, d_out, 1): jax.random.uniform(
                        key, s, jnp.float32, -0.5, 0.5
                    ),
                )
            )
            if i < k - 1:
                factors.append(
                    self.param(
                        f"factor_{i}",
                        lambda key, s=(self.channels, d_out, 1): jnp.zeros(
                            s, jnp.float32
                        ),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors
        # Learned (lower tail, median, upper tail) per channel; trained by
        # the auxiliary loss only.
        self.quantiles = self.param(
            "quantiles",
            lambda key: jnp.tile(
                jnp.asarray([[-self.init_scale, 0.0, self.init_scale]], jnp.float32),
                (self.channels, 1),
            ).reshape(self.channels, 1, 3),
        )

    def _logits_cumulative(self, x: jax.Array, stop_gradient: bool) -> jax.Array:
        """x: (C, 1, N) -> logits of the cumulative at x, (C, 1, N)."""
        for i in range(len(self._matrices)):
            m = self._matrices[i]
            b = self._biases[i]
            if stop_gradient:
                m = jax.lax.stop_gradient(m)
                b = jax.lax.stop_gradient(b)
            x = jnp.einsum("coi,cin->con", jax.nn.softplus(m), x) + b
            if i < len(self._factors):
                f = self._factors[i]
                if stop_gradient:
                    f = jax.lax.stop_gradient(f)
                x = x + jnp.tanh(f) * jnp.tanh(x)
        return x

    def _likelihood(self, v: jax.Array, stop_gradient: bool = False) -> jax.Array:
        """v: (C, 1, N) values -> likelihood of the +-0.5 interval."""
        lower = self._logits_cumulative(v - 0.5, stop_gradient)
        upper = self._logits_cumulative(v + 0.5, stop_gradient)
        # Numerically stable difference-of-sigmoids (evaluate on the side
        # where sigmoid saturates least).
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )

    def medians(self) -> jax.Array:
        return self.quantiles[:, 0, 1]

    def __call__(
        self, y: jax.Array, *, train: bool = False, noise_key: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """y: (B, H, W, C) latents -> (y_hat, likelihoods), both (B, H, W, C)."""
        B, H, W, C = y.shape
        assert C == self.channels, (C, self.channels)
        yf = y.astype(jnp.float32)
        if train:
            if noise_key is None:
                noise_key = self.make_rng("noise")
            y_hat = yf + jax.random.uniform(noise_key, yf.shape, jnp.float32, -0.5, 0.5)
        else:
            med = jax.lax.stop_gradient(self.medians())
            y_hat = jnp.round(yf - med) + med
        # (B,H,W,C) -> (C,1,B*H*W)
        v = jnp.transpose(y_hat, (3, 0, 1, 2)).reshape(C, 1, -1)
        lik = self._likelihood(v)
        lik = jnp.maximum(lik, LIKELIHOOD_MIN)
        lik = lik.reshape(C, B, H, W).transpose(1, 2, 3, 0)
        return y_hat.astype(y.dtype), lik

    def aux_loss(self) -> jax.Array:
        """Quantile-fitting loss: drives `quantiles` to the tail_mass/2,
        0.5, and 1 - tail_mass/2 points of the learned CDF. Gradients flow
        only into `quantiles` (density params are stop-gradiented), so this
        can simply be added to the main loss instead of running CompressAI's
        separate aux optimizer."""
        logits = self._logits_cumulative(
            self.quantiles, stop_gradient=True
        )  # (C,1,3)
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.asarray([-t, 0.0, t], jnp.float32).reshape(1, 1, 3)
        return jnp.sum(jnp.abs(logits - target))


# ----------------------------------------------------------------------------
# Host-side deterministic CDF table construction (the `update()` equivalent)
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class CdfTables:
    """Quantized CDF tables for the rANS coder.

    quantized_cdf: (C, max_len) uint32, row c valid up to cdf_length[c];
      cdf[c, 0] = 0, cdf[c, cdf_length[c]-1] = 1 << precision. The last
      real symbol (index cdf_length[c]-2) is the escape/overflow symbol.
    offset: (C,) int32 — symbol s encodes value s + offset[c].
    cdf_length: (C,) int32.
    medians: (C,) float32 — quantization offsets.
    """

    quantized_cdf: np.ndarray
    offset: np.ndarray
    cdf_length: np.ndarray
    medians: np.ndarray
    precision: int = 16

    def validate(self) -> None:
        C = self.quantized_cdf.shape[0]
        assert self.offset.shape == (C,)
        assert self.cdf_length.shape == (C,)
        for c in range(C):
            n = int(self.cdf_length[c])
            row = self.quantized_cdf[c, :n].astype(np.int64)
            assert row[0] == 0 and row[-1] == (1 << self.precision), row
            assert np.all(np.diff(row) > 0), f"non-monotonic cdf ch{c}"


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Deterministically quantize a pmf (incl. trailing overflow mass) to an
    integer CDF summing to 2**precision, every symbol frequency >= 1."""
    pmf = np.asarray(pmf, np.float64)
    pmf = np.maximum(pmf, 0.0)
    total = 1 << precision
    n = pmf.shape[0]
    if n >= total:
        raise ValueError("pmf too long for precision")
    s = pmf.sum()
    if s <= 0:
        freq = np.full(n, total // n, np.int64)
    else:
        freq = np.floor(pmf / s * total).astype(np.int64)
    freq = np.maximum(freq, 1)
    diff = total - int(freq.sum())
    if diff > 0:
        freq[int(np.argmax(freq))] += diff
    elif diff < 0:
        # Steal deterministically from the richest symbols.
        while diff < 0:
            i = int(np.argmax(freq))
            take = min(-diff, int(freq[i]) - 1)
            if take <= 0:
                raise ValueError("cannot normalize pmf")
            freq[i] -= take
            diff += take
    cdf = np.zeros(n + 1, np.uint32)
    cdf[1:] = np.cumsum(freq).astype(np.uint32)
    assert cdf[-1] == total
    return cdf


def build_cdf_tables(
    eb_params: dict,
    filters: Sequence[int] = (3, 3, 3, 3),
    tail_mass: float = 1e-9,
    precision: int = 16,
) -> CdfTables:
    """Bake an entropy bottleneck's learned density into CDF tables.

    Mirrors CompressAI's `EntropyBottleneck.update(force=True)` behavior
    (called by the reference before every compress/decompress,
    codec_processing.py:462-500): pmf support spans the learned tail
    quantiles around the median; overflow mass goes to a trailing escape
    symbol. Pure float64 numpy — bit-deterministic across hosts.
    """
    quantiles = np.asarray(eb_params["quantiles"], np.float64)  # (C,1,3)
    C = quantiles.shape[0]
    k = len(filters) + 1
    mats = [np.asarray(eb_params[f"matrix_{i}"], np.float64) for i in range(k)]
    biases = [np.asarray(eb_params[f"bias_{i}"], np.float64) for i in range(k)]
    factors = [np.asarray(eb_params[f"factor_{i}"], np.float64) for i in range(k - 1)]

    def logits_cumulative(x: np.ndarray) -> np.ndarray:
        # x: (C, 1, N)
        for i in range(k):
            m = np.log1p(np.exp(-np.abs(mats[i]))) + np.maximum(mats[i], 0)  # softplus
            x = np.einsum("coi,cin->con", m, x) + biases[i]
            if i < k - 1:
                x = x + np.tanh(factors[i]) * np.tanh(x)
        return x

    def sigmoid(x):
        return 0.5 * (1.0 + np.tanh(0.5 * x))

    medians = quantiles[:, 0, 1]
    minima = np.maximum(np.ceil(medians - quantiles[:, 0, 0]), 0).astype(np.int64)
    maxima = np.maximum(np.ceil(quantiles[:, 0, 2] - medians), 0).astype(np.int64)
    pmf_length = (minima + maxima + 1).astype(np.int64)
    max_length = int(pmf_length.max())

    # samples[c, n] = median[c] + (n - minima[c]) for n in [0, max_length)
    grid = np.arange(max_length, dtype=np.float64)[None, :]  # (1, L)
    samples = medians[:, None] + (grid - minima[:, None])  # (C, L)
    v = samples[:, None, :]  # (C,1,L)
    lower = logits_cumulative(v - 0.5)[:, 0, :]
    upper = logits_cumulative(v + 0.5)[:, 0, :]
    pmf = np.abs(sigmoid(upper) - sigmoid(lower))  # (C, L)
    # Tail mass outside the modeled support, folded into the escape symbol.
    lo_edge = logits_cumulative(
        (samples[:, :1] - 0.5)[:, None, :]
    )[:, 0, 0]
    hi_idx = pmf_length - 1
    hi_samples = medians + (hi_idx - minima)
    hi_edge = logits_cumulative((hi_samples[:, None] + 0.5)[:, None, :])[:, 0, 0]
    tail = sigmoid(lo_edge) + (1.0 - sigmoid(hi_edge))

    max_cdf_len = max_length + 2
    quantized = np.zeros((C, max_cdf_len), np.uint32)
    cdf_length = np.zeros(C, np.int32)
    for c in range(C):
        n = int(pmf_length[c])
        p = np.concatenate([pmf[c, :n], [max(tail[c], 0.0)]])
        cdf = pmf_to_quantized_cdf(p, precision)
        quantized[c, : cdf.shape[0]] = cdf
        cdf_length[c] = cdf.shape[0]

    tables = CdfTables(
        quantized_cdf=quantized,
        offset=(-minima).astype(np.int32),
        cdf_length=cdf_length,
        medians=medians.astype(np.float32),
        precision=precision,
    )
    tables.validate()
    return tables


def quantize_to_symbols(y: np.ndarray, medians: np.ndarray) -> np.ndarray:
    """(B,H,W,C) float latents -> int32 symbol values round(y - median)."""
    return np.round(
        np.asarray(y, np.float64) - medians[None, None, None, :]
    ).astype(np.int32)


def dequantize_symbols(sym: np.ndarray, medians: np.ndarray) -> np.ndarray:
    """int32 symbols -> float32 latents (symbol + median)."""
    return (sym.astype(np.float32) + medians[None, None, None, :]).astype(np.float32)
