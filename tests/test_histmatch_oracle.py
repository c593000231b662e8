"""skimage-parity oracle for the device histogram matcher.

skimage is not installed in this environment, so the oracle is a direct
numpy transcription of skimage.exposure.histogram_matching's
_match_cumulative_cdf for uint8 inputs (the exact routine the reference
calls per YCrCb channel, /root/reference/codec_processing.py:1587-1659):
bincount -> quantiles over PRESENT template values only -> np.interp ->
LUT gather. Any semantic drift in the device version (e.g. interpolating
across zero-count bins) fails these tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from rdvc_tpu.postproc.histmatch import _match_channel


def skimage_match_histograms_uint8(source: np.ndarray, template: np.ndarray):
    """Executable spec of skimage _match_cumulative_cdf (uint8 branch)."""
    src_lookup = source.reshape(-1)
    src_counts = np.bincount(src_lookup, minlength=256)
    tmpl_counts_full = np.bincount(template.reshape(-1), minlength=256)
    tmpl_values = np.nonzero(tmpl_counts_full)[0]
    tmpl_counts = tmpl_counts_full[tmpl_values]
    src_quantiles = np.cumsum(src_counts) / source.size
    tmpl_quantiles = np.cumsum(tmpl_counts) / template.size
    interp_a_values = np.interp(src_quantiles, tmpl_quantiles, tmpl_values)
    return interp_a_values[src_lookup].reshape(source.shape)


def _device_match(src_u8: np.ndarray, tmpl_u8: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    out = _match_channel(
        jnp.asarray(src_u8.reshape(-1), jnp.float32),
        jnp.asarray(tmpl_u8.reshape(-1), jnp.float32),
    )
    return np.asarray(out).reshape(src_u8.shape)


CASES = {
    "dense_random": lambda r: (
        r.randint(0, 256, (64, 80), np.uint8),
        r.randint(0, 256, (64, 80), np.uint8),
    ),
    "sparse_template": lambda r: (
        r.choice([3, 77, 200, 255], (48, 48)).astype(np.uint8),
        r.choice([10, 20], (48, 48)).astype(np.uint8),
    ),
    "sparse_both": lambda r: (
        r.choice([0, 128], (32, 32)).astype(np.uint8),
        r.choice([5, 250], (32, 32)).astype(np.uint8),
    ),
    "constant_source": lambda r: (
        np.full((16, 16), 42, np.uint8),
        r.randint(0, 256, (16, 16), np.uint8),
    ),
    "constant_template": lambda r: (
        r.randint(0, 256, (16, 16), np.uint8),
        np.full((16, 16), 9, np.uint8),
    ),
    "skewed_gaussian": lambda r: (
        np.clip(r.normal(60, 20, (64, 64)), 0, 255).astype(np.uint8),
        np.clip(r.normal(180, 35, (64, 64)), 0, 255).astype(np.uint8),
    ),
    "different_sizes": lambda r: (
        r.randint(0, 256, (64, 64), np.uint8),
        r.randint(100, 140, (32, 16), np.uint8),
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_match_channel_equals_skimage_spec(name):
    rng = np.random.RandomState(hash(name) % (2**31))
    src, tmpl = CASES[name](rng)
    want = skimage_match_histograms_uint8(src, tmpl)
    got = _device_match(src, tmpl)
    # float32 quantile arithmetic vs the spec's float64: tolerance well
    # under one uint8 quantization step.
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0)


def test_full_frame_match_changes_toward_reference_stats():
    """End-to-end sanity on the (B,H,W,3) API: matching moves the frame's
    channel means toward the reference's."""
    import jax.numpy as jnp

    from rdvc_tpu.postproc.histmatch import histogram_match_ycrcb

    rng = np.random.RandomState(0)
    cur = rng.rand(1, 40, 56, 3).astype(np.float32) * 0.5  # dark
    ref = 0.5 + rng.rand(1, 40, 56, 3).astype(np.float32) * 0.5  # bright
    out = np.asarray(histogram_match_ycrcb(jnp.asarray(cur), jnp.asarray(ref)))
    assert out.shape == cur.shape
    assert abs(out.mean() - ref.mean()) < abs(cur.mean() - ref.mean())
