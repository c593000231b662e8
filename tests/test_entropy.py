"""Entropy subsystem tests: factorized bottleneck, CDF export, rANS coder.

Mirrors the reference's correctness criteria: byte round-trips through
EntropyBottleneck.compress/decompress (codec_processing.py:488,564,589) and
estimated-vs-real bitstream cross-checks (new_train.py:991-1005).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdvc_tpu.entropy import FactorizedEntropyBottleneck, build_cdf_tables
from rdvc_tpu.entropy.factorized import pmf_to_quantized_cdf
from rdvc_tpu.entropy.rans import (
    RansCodec,
    decode_with_tables,
    encode_with_tables,
    native_available,
)


def _init_eb(channels=8, seed=0):
    eb = FactorizedEntropyBottleneck(channels)
    variables = eb.init(
        {"params": jax.random.PRNGKey(seed), "noise": jax.random.PRNGKey(seed + 1)},
        jnp.zeros((1, 4, 4, channels)),
        train=True,
    )
    return eb, variables


def test_likelihood_sums_to_one():
    eb, variables = _init_eb()
    # Integrate the pmf over a wide integer support: should be ~1 per channel.
    # (The init density is a ~logistic with scale init_scale=10, so the grid
    # must extend far past the +-10 tails to capture >0.99 of the mass.)
    grid = jnp.arange(-200, 201, dtype=jnp.float32)
    y = jnp.tile(grid.reshape(1, -1, 1, 1), (1, 1, 1, 8))
    _, lik = eb.apply(variables, y, train=False)
    totals = np.asarray(lik).sum(axis=(0, 1, 2))
    assert np.all(totals > 0.99) and np.all(totals <= 1.0 + 1e-4), totals


def test_training_path_adds_noise():
    eb, variables = _init_eb()
    y = jnp.zeros((1, 16, 16, 8))
    y_hat, lik = eb.apply(
        variables, y, train=True, rngs={"noise": jax.random.PRNGKey(7)}
    )
    noise = np.asarray(y_hat)
    assert np.abs(noise).max() <= 0.5 + 1e-6
    assert np.abs(noise).mean() > 0.1
    assert np.all(np.asarray(lik) > 0)


def test_eval_path_rounds_to_median():
    eb, variables = _init_eb()
    y = jnp.full((1, 4, 4, 8), 1.3)
    y_hat, _ = eb.apply(variables, y, train=False)
    med = np.asarray(variables["params"]["quantiles"])[:, 0, 1]
    expected = np.round(1.3 - med) + med
    np.testing.assert_allclose(
        np.asarray(y_hat)[0, 0, 0], expected, atol=1e-5
    )


def test_pmf_to_quantized_cdf():
    pmf = np.array([0.1, 0.7, 0.15, 0.05])
    cdf = pmf_to_quantized_cdf(pmf)
    assert cdf[0] == 0 and cdf[-1] == 1 << 16
    assert np.all(np.diff(cdf) >= 1)
    # Zero-probability symbols still get freq >= 1
    cdf2 = pmf_to_quantized_cdf(np.array([1.0, 0.0, 0.0]))
    assert np.all(np.diff(cdf2) >= 1)


def test_cdf_tables_valid():
    eb, variables = _init_eb(channels=16, seed=3)
    tables = build_cdf_tables(variables["params"])
    tables.validate()
    assert tables.quantized_cdf.shape[0] == 16


def _roundtrip(codec, seed=0, channels=16, hw=(6, 10), scale=3.0):
    eb, variables = _init_eb(channels=channels, seed=seed)
    tables = build_cdf_tables(variables["params"])
    rng = np.random.RandomState(seed)
    latent = (rng.randn(1, hw[0], hw[1], channels) * scale).astype(np.float32)
    data = encode_with_tables(latent, tables, codec)
    out = decode_with_tables(data, hw, tables, codec)
    med = tables.medians[None, None, None, :]
    expected = np.round(latent - med) + med
    np.testing.assert_allclose(out, expected, atol=1e-5)
    return data


def test_rans_roundtrip_python():
    _roundtrip(RansCodec(use_native=False))


@pytest.mark.skipif(not native_available(), reason="C++ rANS lib not built")
def test_rans_roundtrip_native():
    _roundtrip(RansCodec(use_native=True))


@pytest.mark.skipif(not native_available(), reason="C++ rANS lib not built")
def test_native_matches_python_bytes():
    for seed in range(3):
        d_py = _roundtrip(RansCodec(use_native=False), seed=seed)
        d_cc = _roundtrip(RansCodec(use_native=True), seed=seed)
        assert d_py == d_cc


def test_rans_overflow_symbols():
    """Out-of-support values must survive via the bypass path."""
    eb, variables = _init_eb(channels=4, seed=9)
    tables = build_cdf_tables(variables["params"])
    latent = np.zeros((1, 2, 2, 4), np.float32)
    latent[0, 0, 0, 0] = 500.0
    latent[0, 1, 1, 3] = -777.0
    codec = RansCodec(use_native=False)
    data = encode_with_tables(latent, tables, codec)
    out = decode_with_tables(data, (2, 2), tables, codec)
    med = tables.medians[None, None, None, :]
    expected = np.round(latent - med) + med
    np.testing.assert_allclose(out, expected, atol=1e-5)
    if native_available():
        data_n = encode_with_tables(latent, tables, RansCodec(use_native=True))
        assert data_n == data
        out_n = decode_with_tables(data_n, (2, 2), tables, RansCodec(use_native=True))
        np.testing.assert_allclose(out_n, expected, atol=1e-5)


def test_bitstream_size_tracks_entropy():
    """Real rANS size should be close to the estimated -log2(likelihood) sum
    (the reference's every-200-batch cross-check, new_train.py:991-1005)."""
    eb, variables = _init_eb(channels=32, seed=11)
    tables = build_cdf_tables(variables["params"])
    rng = np.random.RandomState(11)
    latent = (rng.randn(1, 16, 16, 32) * 2.0).astype(np.float32)
    y_hat, lik = eb.apply(variables, jnp.asarray(latent), train=False)
    est_bits = float(-jnp.sum(jnp.log2(lik)))
    data = encode_with_tables(latent, tables, RansCodec(use_native=False))
    real_bits = len(data) * 8
    assert real_bits < est_bits * 1.15 + 256
    assert real_bits > est_bits * 0.85 - 256
