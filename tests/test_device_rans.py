"""Device-side chunked rANS16 coder tests.

Round-trips: JAX encode kernel -> Python reference decoder -> C++ parallel
decoder; escape detection; payload-tag dispatch; bitstream size sanity
against the estimated entropy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdvc_tpu.entropy import FactorizedEntropyBottleneck, build_cdf_tables
from rdvc_tpu.entropy.device_rans import (
    DeviceRansEncoder,
    decode_chunked_ca_py,
    parse_chunked_header,
    CA_TAG,
)
from rdvc_tpu.entropy.rans import native_available
from rdvc_tpu.entropy.rans.coder import (
    _channel_indexes,
    decode_chunked_ca,
    decode_payload,
)


def _tables(channels=8, seed=0):
    eb = FactorizedEntropyBottleneck(channels)
    variables = eb.init(
        {"params": jax.random.PRNGKey(seed), "noise": jax.random.PRNGKey(seed + 1)},
        jnp.zeros((1, 4, 4, channels)),
        train=True,
    )
    return build_cdf_tables(variables["params"])


def _in_range_symbols(tables, shape, seed=0):
    """Symbols guaranteed inside each channel's table support."""
    rng = np.random.RandomState(seed)
    h, w, c = shape
    max_v = tables.cdf_length - 2
    lo = tables.offset
    sym = np.empty((1, h, w, c), np.int32)
    for ch in range(c):
        sym[..., ch] = rng.randint(lo[ch], lo[ch] + max_v[ch], (1, h, w))
    return sym


def test_device_encode_py_decode_roundtrip():
    tables = _tables()
    sym = _in_range_symbols(tables, (6, 10, 8), seed=1)
    enc = DeviceRansEncoder(tables, num_streams=16)
    payload = enc.assemble(*enc.encode_device(jnp.asarray(sym)))
    assert payload is not None and payload[0] == CA_TAG
    out = decode_chunked_ca_py(payload, tables)
    np.testing.assert_array_equal(out, sym.ravel())


@pytest.mark.skipif(not native_available(), reason="C++ lib unavailable")
@pytest.mark.slow
def test_device_encode_cpp_decode_roundtrip():
    tables = _tables(seed=2)
    sym = _in_range_symbols(tables, (12, 20, 8), seed=3)
    enc = DeviceRansEncoder(tables, num_streams=32)
    payload = enc.assemble(*enc.encode_device(jnp.asarray(sym)))
    assert payload is not None
    n = 12 * 20 * 8
    out = decode_chunked_ca(payload, n, tables, num_threads=4)
    np.testing.assert_array_equal(out, sym.ravel())
    # single-thread path must agree
    out1 = decode_chunked_ca(payload, n, tables, num_threads=1)
    np.testing.assert_array_equal(out1, sym.ravel())
    # C++ must be byte-identical to the Python executable spec output
    np.testing.assert_array_equal(out, decode_chunked_ca_py(payload, tables))


def test_escape_triggers_fallback():
    tables = _tables(seed=4)
    sym = _in_range_symbols(tables, (4, 4, 8), seed=5)
    sym[0, 0, 0, 0] = 30000  # far outside support
    enc = DeviceRansEncoder(tables, num_streams=8)
    payload = enc.assemble(*enc.encode_device(jnp.asarray(sym)))
    assert payload is None


def test_decode_payload_dispatch():
    """decode_payload must handle both single-stream and chunked tags."""
    from rdvc_tpu.entropy.rans import RansCodec

    tables = _tables(seed=6)
    sym = _in_range_symbols(tables, (5, 7, 8), seed=7)
    idx = _channel_indexes((5, 7), 8)
    codec = RansCodec(use_native=False)
    single = bytes([0x01]) + codec.encode(sym.ravel(), idx, tables)
    np.testing.assert_array_equal(
        decode_payload(single, idx, tables, codec), sym.ravel()
    )
    enc = DeviceRansEncoder(tables, num_streams=8)
    chunked = enc.assemble(*enc.encode_device(jnp.asarray(sym)))
    np.testing.assert_array_equal(
        decode_payload(chunked, idx, tables, codec), sym.ravel()
    )


@pytest.mark.slow
def test_chunked_size_tracks_entropy():
    """Chunked payload should be within ~20% of the single-stream size."""
    from rdvc_tpu.entropy.rans import RansCodec

    tables = _tables(channels=16, seed=8)
    rng = np.random.RandomState(8)
    h, w, c = 16, 16, 16
    max_v = tables.cdf_length - 2
    lo = tables.offset
    # concentrated near the median -> low entropy
    sym = np.empty((1, h, w, c), np.int32)
    for ch in range(c):
        center = lo[ch] + max_v[ch] // 2
        vals = np.clip(
            rng.normal(center, 2.0, (1, h, w)).round(),
            lo[ch], lo[ch] + max_v[ch] - 1,
        )
        sym[..., ch] = vals
    idx = _channel_indexes((h, w), c)
    single = RansCodec(use_native=False).encode(sym.ravel(), idx, tables)
    enc = DeviceRansEncoder(tables, num_streams=64)
    chunked = enc.assemble(*enc.encode_device(jnp.asarray(sym)))
    assert chunked is not None
    # per-stream overhead: 4 bytes state + 4 bytes length each
    overhead = 64 * 8 + 7
    assert len(chunked) - overhead < len(single) * 1.2 + 64
    header = parse_chunked_header(chunked)
    assert header[0] == h * w * c and header[1] == 64


def test_device_decoder_roundtrip_batch():
    """Device encode -> DEVICE decode kernel round trip, batched."""
    from rdvc_tpu.entropy.device_rans import DeviceRansDecoder

    tables = _tables(seed=9)
    enc = DeviceRansEncoder(tables, num_streams=16)
    payloads, syms = [], []
    for s in range(3):
        sym = _in_range_symbols(tables, (6, 10, 8), seed=20 + s)
        payload = enc.assemble(*enc.encode_device(jnp.asarray(sym)))
        assert payload is not None
        payloads.append(payload)
        syms.append(sym)
    dec = DeviceRansDecoder(tables)
    out = np.asarray(dec.decode_device(payloads))  # (3, n)
    for s in range(3):
        np.testing.assert_array_equal(out[s], syms[s].ravel())


def test_device_decoder_matches_python_spec():
    from rdvc_tpu.entropy.device_rans import DeviceRansDecoder

    tables = _tables(channels=5, seed=11)
    enc = DeviceRansEncoder(tables, num_streams=8)
    sym = _in_range_symbols(tables, (9, 7, 5), seed=12)
    payload = enc.assemble(*enc.encode_device(jnp.asarray(sym)))
    assert payload is not None
    want = decode_chunked_ca_py(payload, tables)
    got = np.asarray(DeviceRansDecoder(tables).decode_device([payload]))[0]
    np.testing.assert_array_equal(got, want)


def test_runtime_decode_payloads_device():
    """CodecRuntime.decode_payloads_device: chunked -> device symbols;
    host-coded payloads raise (caller falls back)."""
    import pytest as _pytest

    from rdvc_tpu.config import ModelConfig
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

    rt = CodecRuntime(model_cfg=ModelConfig())
    rng = np.random.RandomState(0)
    h, w = 8, 8
    c = rt.motion_tables.medians.shape[0]
    sym = np.zeros((2, h, w, c), np.int16)
    for ch in range(c):
        lo = rt.motion_tables.offset[ch]
        hi = lo + rt.motion_tables.cdf_length[ch] - 2
        sym[..., ch] = rng.randint(lo, max(lo + 1, hi), (2, h, w))
    menc = rt._device_encoders[0]
    payloads = menc.assemble_batch(*menc.encode_device_batch(jnp.asarray(sym)))
    assert all(p is not None for p in payloads)
    out = np.asarray(
        rt.decode_payloads_device(payloads, "motion", (h, w))
    )
    np.testing.assert_array_equal(out, sym)
    with _pytest.raises(ValueError):
        rt.decode_payloads_device([b"\x01junk"], "motion", (h, w))


def test_packed_flush_roundtrip_matches_per_kind():
    """pack_flush_sections_traced + fetch_packed_flush + split must
    reproduce the exact per-kind payload bytes of assemble_batch, for every
    hint regime (no hint, under-predicting hint -> second fetch, generous
    hint -> single fetch)."""
    from rdvc_tpu.entropy.device_rans import (
        _pack_assemble_meta,
        ca_layout,
        fetch_packed_flush,
        pack_flush_sections_traced,
        split_packed_sections,
    )

    t_m = _tables(channels=4, seed=3)
    t_r = _tables(channels=8, seed=4)
    B = 3
    m_sym = np.concatenate(
        [_in_range_symbols(t_m, (6, 10, 4), seed=10 + i) for i in range(B)]
    )
    r_sym = np.concatenate(
        [_in_range_symbols(t_r, (4, 6, 8), seed=20 + i) for i in range(B)]
    )
    menc = DeviceRansEncoder(t_m, num_streams=8)
    renc = DeviceRansEncoder(t_r, num_streams=16)

    # Reference payloads via the classic per-kind path.
    ref_m = menc.assemble_batch(*menc.encode_device_batch(jnp.asarray(m_sym)))
    ref_r = renc.assemble_batch(*renc.encode_device_batch(jnp.asarray(r_sym)))

    # Packed path.
    m_flat, m_meta, _ = menc.encode_traced(
        jnp.asarray(m_sym), menc.encode_consts
    )
    r_flat, r_meta, _ = renc.encode_traced(
        jnp.asarray(r_sym), renc.encode_consts
    )
    meta_all = jnp.concatenate([m_meta, r_meta], axis=1)
    packed = pack_flush_sections_traced(
        meta_all,
        [m_flat, r_flat],
        [m_meta[:, 2 * menc.num_streams], r_meta[:, 2 * renc.num_streams]],
    )
    wm = 2 * menc.num_streams + 2
    wr = 2 * renc.num_streams + 2

    def needed_of(meta):
        return int(
            (
                meta[:, wm - 2].astype(np.int64)
                + meta[:, wm + wr - 2].astype(np.int64)
            ).max()
        )

    _, _, len_m = ca_layout(4, 60, menc.target_streams)
    _, _, len_r = ca_layout(8, 24, renc.target_streams)
    for hint in (None, 1, 1 << 20):
        meta_np, words_np, needed = fetch_packed_flush(
            packed, wm + wr, needed_of, hint
        )
        assert needed == needed_of(meta_np)
        m_words, r_words = split_packed_sections(
            words_np, [meta_np[:, wm - 2], meta_np[:, wm + wr - 2]]
        )
        got_m = menc.assemble_batch_np(m_words, meta_np[:, :wm], 60 * 4, len_m)
        got_r = renc.assemble_batch_np(r_words, meta_np[:, wm:], 24 * 8, len_r)
        assert got_m == ref_m and got_r == ref_r
        # And the payloads decode back to the symbols.
        for i in range(B):
            np.testing.assert_array_equal(
                decode_chunked_ca_py(got_m[i], t_m), m_sym[i].ravel()
            )
