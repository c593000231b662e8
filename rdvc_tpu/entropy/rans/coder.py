"""rANS coder bindings: C++ fast path (ctypes) + pure-Python reference.

The Python implementation is the executable spec; the C++ library
(`rans.cpp`) must be byte-identical to it (tested in
tests/test_entropy.py). Both consume the CdfTables produced by
rdvc_tpu.entropy.factorized.build_cdf_tables.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from rdvc_tpu.entropy.factorized import CdfTables

_PROB_BITS = 16
_RANS_L = 1 << 23
_BYPASS_BITS = 4

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        from rdvc_tpu.entropy.rans.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.rdvc_rans_encode.restype = ctypes.c_int64
        lib.rdvc_rans_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.rdvc_rans_decode.restype = ctypes.c_int64
        lib.rdvc_rans_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rdvc_rans16ca_decode.restype = ctypes.c_int64
        lib.rdvc_rans16ca_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.rdvc_rans16bin_decode.restype = ctypes.c_int64
        lib.rdvc_rans16bin_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


# ----------------------------------------------------------------------------
# Pure-Python reference implementation (executable spec for rans.cpp)
# ----------------------------------------------------------------------------


def _py_encode(
    symbols: np.ndarray,
    indexes: np.ndarray,
    cdfs: np.ndarray,
    cdf_lengths: np.ndarray,
    offsets: np.ndarray,
) -> bytes:
    ops = []  # decode-order op list: ("sym", start, freq) | ("bits", val, n)
    for e in range(symbols.shape[0]):
        c = int(indexes[e])
        cdf = cdfs[c]
        max_v = int(cdf_lengths[c]) - 2
        v = int(symbols[e]) - int(offsets[c])
        overflow = v < 0 or v >= max_v
        if v < 0:
            raw = -2 * v - 1
        elif v >= max_v:
            raw = 2 * (v - max_v)
        s = max_v if overflow else v
        ops.append(("sym", int(cdf[s]), int(cdf[s + 1]) - int(cdf[s])))
        if overflow:
            r = raw
            while True:
                chunk = r & 0x7
                r >>= 3
                ops.append(("bits", chunk | (0x8 if r else 0), _BYPASS_BITS))
                if not r:
                    break

    state = _RANS_L
    out = bytearray()
    for op in reversed(ops):
        if op[0] == "sym":
            _, start, freq = op
        else:
            _, val, nbits = op
            freq = 1 << (_PROB_BITS - nbits)
            start = val << (_PROB_BITS - nbits)
        x_max = ((_RANS_L >> _PROB_BITS) << 8) * freq
        while state >= x_max:
            out.append(state & 0xFF)
            state >>= 8
        state = ((state // freq) << _PROB_BITS) + (state % freq) + start
    for _ in range(4):
        out.append(state & 0xFF)
        state >>= 8
    return bytes(reversed(out))


def _py_decode(
    data: bytes,
    indexes: np.ndarray,
    cdfs: np.ndarray,
    cdf_lengths: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    n = indexes.shape[0]
    out = np.zeros(n, np.int32)
    pos = 0

    def next_byte():
        nonlocal pos
        b = data[pos] if pos < len(data) else 0
        pos += 1
        return b

    state = 0
    for _ in range(4):
        state = (state << 8) | next_byte()

    def advance(start, freq):
        nonlocal state
        x = freq * (state >> _PROB_BITS) + (state & 0xFFFF) - start
        while x < _RANS_L:
            x = (x << 8) | next_byte()
        state = x

    for e in range(n):
        c = int(indexes[e])
        cdf = cdfs[c]
        cdf_len = int(cdf_lengths[c])
        max_v = cdf_len - 2
        cum = state & 0xFFFF
        s = int(np.searchsorted(cdf[:cdf_len], cum, side="right")) - 1
        s = min(s, cdf_len - 2)
        advance(int(cdf[s]), int(cdf[s + 1]) - int(cdf[s]))
        v = s
        if s == max_v:
            raw = 0
            shift = 0
            while True:
                val = (state >> (_PROB_BITS - _BYPASS_BITS)) & 0xF
                advance(val << (_PROB_BITS - _BYPASS_BITS), 1 << (_PROB_BITS - _BYPASS_BITS))
                raw |= (val & 0x7) << shift
                shift += 3
                if not (val & 0x8):
                    break
            v = -((raw + 1) // 2) if raw & 1 else max_v + raw // 2
        out[e] = v + int(offsets[c])
    return out


# ----------------------------------------------------------------------------
# Public API
# ----------------------------------------------------------------------------


class RansCodec:
    """Encode/decode int32 symbol arrays against CdfTables."""

    def __init__(self, use_native: Optional[bool] = None):
        if use_native is None:
            use_native = native_available()
        elif use_native and not native_available():
            raise RuntimeError("native rANS library unavailable")
        self.use_native = use_native

    def encode(
        self,
        symbols: np.ndarray,
        indexes: np.ndarray,
        tables: CdfTables,
    ) -> bytes:
        symbols = np.ascontiguousarray(symbols, np.int32).ravel()
        indexes = np.ascontiguousarray(indexes, np.int32).ravel()
        assert symbols.shape == indexes.shape
        cdfs = np.ascontiguousarray(tables.quantized_cdf, np.uint32)
        lens = np.ascontiguousarray(tables.cdf_length, np.int32)
        offs = np.ascontiguousarray(tables.offset, np.int32)
        if not self.use_native:
            return _py_encode(symbols, indexes, cdfs, lens, offs)
        lib = _load_lib()
        cap = max(4096, symbols.shape[0] * 8 + 64)
        while True:
            out = np.zeros(cap, np.uint8)
            n = lib.rdvc_rans_encode(
                symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                symbols.shape[0],
                cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                cdfs.shape[1],
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                cap,
            )
            if n == -1:
                cap *= 4
                continue
            if n < 0:
                raise RuntimeError(f"rANS encode failed: {n}")
            return out[:n].tobytes()

    def decode(
        self,
        data: bytes,
        indexes: np.ndarray,
        tables: CdfTables,
    ) -> np.ndarray:
        indexes = np.ascontiguousarray(indexes, np.int32).ravel()
        cdfs = np.ascontiguousarray(tables.quantized_cdf, np.uint32)
        lens = np.ascontiguousarray(tables.cdf_length, np.int32)
        offs = np.ascontiguousarray(tables.offset, np.int32)
        if not self.use_native:
            return _py_decode(data, indexes, cdfs, lens, offs)
        lib = _load_lib()
        buf = np.frombuffer(data, np.uint8)
        buf = np.ascontiguousarray(buf)
        out = np.zeros(indexes.shape[0], np.int32)
        rc = lib.rdvc_rans_decode(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.shape[0],
            indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            indexes.shape[0],
            cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            cdfs.shape[1],
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError(f"rANS decode failed: {rc}")
        return out


def _channel_indexes(shape_hw: tuple, channels: int) -> np.ndarray:
    """Per-element table index for an (H, W, C) latent: the channel id."""
    h, w = shape_hw
    return np.tile(np.arange(channels, dtype=np.int32), h * w)


# Payload tags: single-stream host rANS (0x01) vs channel-aligned chunked
# device rANS16 (0x03, entropy/device_rans.py) vs hyperprior composite
# (0x04: coded hyper-latent z + Gaussian-conditional-coded y). Dispatch at
# decode time.
SINGLE_TAG = 0x01
CA_TAG = 0x03
HYPER_TAG = 0x04


def pack_hyper_payload(
    z_shape_hw: tuple, z_bytes: bytes, y_bytes: bytes
) -> bytes:
    """Hyperprior per-AE payload:
    [u8 0x04][i32 zH][i32 zW][u32 z_len][z blob][y blob].

    Nested inside the standard P-frame payload's per-AE byte slots
    (container/rdvc_format.py pack_pframe_payload) — the outer container
    layout is unchanged; only the inner blob grows a hyper-latent section.
    The y section runs to the end of the blob (its length is the outer
    u32 minus the header), mirroring the container's length-prefix style
    (/root/reference/codec_processing.py:1482-1495 big-endian packing).

    Both inner blobs carry their own transport tag: z is 0x01 (host
    single-stream) or 0x03 (channel-aligned device rANS16); y is 0x01 or
    0x05 (bin-indexed device rANS16, entropy/device_gaussian.py). The
    decoder dispatches per blob, so device- and host-coded frames can mix
    freely within one stream.
    """
    import struct

    zh, zw = int(z_shape_hw[0]), int(z_shape_hw[1])
    return (
        bytes([HYPER_TAG])
        + struct.pack(">iiI", zh, zw, len(z_bytes))
        + z_bytes
        + y_bytes
    )


def unpack_hyper_payload(payload: bytes):
    """-> ((zH, zW), z_bytes, y_bytes); raises on a non-0x04 tag."""
    import struct

    if not payload or payload[0] != HYPER_TAG:
        raise ValueError("not a hyperprior (0x04) payload")
    zh, zw, z_len = struct.unpack(">iiI", payload[1:13])
    z_end = 13 + z_len
    if z_end > len(payload):
        raise ValueError("truncated hyperprior payload")
    return (zh, zw), payload[13:z_end], payload[z_end:]


def decode_chunked_ca(
    payload: bytes,
    n_symbols: int,
    tables: CdfTables,
    num_threads: int = 4,
) -> np.ndarray:
    """Decode a channel-aligned chunked rANS16 payload (tag 0x03; C++
    parallel-stream fast path with a pure-Python fallback). Output is in
    tensor (pixel-major, channel-minor) order."""
    lib = _load_lib()
    if lib is None:
        from rdvc_tpu.entropy.device_rans import decode_chunked_ca_py

        return decode_chunked_ca_py(payload, tables)
    buf = np.ascontiguousarray(np.frombuffer(payload, np.uint8))
    cdfs = np.ascontiguousarray(tables.quantized_cdf, np.uint32)
    lens = np.ascontiguousarray(tables.cdf_length, np.int32)
    offs = np.ascontiguousarray(tables.offset, np.int32)
    out = np.zeros(n_symbols, np.int32)
    rc = lib.rdvc_rans16ca_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.shape[0],
        n_symbols,
        cdfs.shape[0],
        cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cdfs.shape[1],
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads,
    )
    if rc != 0:
        raise RuntimeError(f"channel-aligned rANS decode failed: {rc}")
    return out


def decode_payload(
    payload: bytes,
    indexes: np.ndarray,
    tables: CdfTables,
    codec: Optional[RansCodec] = None,
    num_threads: int = 4,
) -> np.ndarray:
    """Tag-dispatching decode -> int32 symbols."""
    if not payload:
        raise ValueError("empty payload")
    tag = payload[0]
    if tag == SINGLE_TAG:
        codec = codec or RansCodec()
        return codec.decode(payload[1:], indexes, tables)
    if tag == CA_TAG:
        return decode_chunked_ca(
            payload, indexes.shape[0], tables, num_threads
        )
    if tag == 0x02:
        raise ValueError(
            "payload tag 0x02 (pre-channel-aligned chunked rANS16) is no "
            "longer supported; bitstreams written before the 0x03 format "
            "switch must be re-encoded"
        )
    raise ValueError(f"unknown payload tag {tag}")


def encode_with_tables(
    latent: np.ndarray, tables: CdfTables, codec: Optional[RansCodec] = None
) -> bytes:
    """Compress a (1, H, W, C) float latent into a tagged bytestring
    (EntropyBottleneck.compress equivalent)."""
    codec = codec or RansCodec()
    assert latent.ndim == 4 and latent.shape[0] == 1, latent.shape
    _, h, w, c = latent.shape
    sym = np.round(
        np.asarray(latent[0], np.float64) - tables.medians[None, None, :]
    ).astype(np.int32)
    indexes = _channel_indexes((h, w), c)
    return bytes([SINGLE_TAG]) + codec.encode(sym.ravel(), indexes, tables)


def decode_with_tables(
    data: bytes,
    shape_hw: tuple,
    tables: CdfTables,
    codec: Optional[RansCodec] = None,
) -> np.ndarray:
    """Decompress to a (1, H, W, C) float32 latent
    (EntropyBottleneck.decompress equivalent)."""
    codec = codec or RansCodec()
    h, w = int(shape_hw[0]), int(shape_hw[1])
    c = tables.medians.shape[0]
    indexes = _channel_indexes((h, w), c)
    sym = decode_payload(data, indexes, tables, codec).reshape(h, w, c)
    latent = sym.astype(np.float32) + tables.medians[None, None, :]
    return latent[None]
