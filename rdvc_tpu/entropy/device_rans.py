"""Device-side multistream rANS encoder (TPU-native entropy coding).

The encode pipeline's bottleneck over a slow host link is downloading raw
latent symbols (~2 B/symbol); entropy-coding ON the TPU shrinks the download
to the actual compressed size. Classic byte-wise rANS emits a data-dependent
number of bytes per symbol — hostile to vector hardware — so this coder uses
the 16-bit-renormalization rANS variant (b = 2^16, L = 2^16, 32-bit state):
every encode step emits EXACTLY 0 or 1 uint16 word. That makes the whole
encoder a lax.scan of uint32 vector arithmetic over S independent streams,
followed by a single lax.sort pass that compacts the (step, stream) word
grid into per-stream prefixes.

Out-of-table symbols are not bypass-coded on device: a batch containing any
escape falls back to the host coder (they are rare by construction once the
entropy model matches the data — tail_mass 1e-9).

Bitstream format (payload tag 0x02, "chunked rANS16"):
    [u8 0x02][u32 n_symbols][u16 S][u32 byte_len[S]][stream bytes...]
Each stream's bytes are little-endian uint16 words in DECODE order: the
final encoder state (2 words, high first) followed by the emitted words
reversed. Decoding is embarrassingly parallel across streams (see
rans.cpp: rdvc_rans16_decode).
"""

from __future__ import annotations

import functools
import struct
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rdvc_tpu.entropy.factorized import CdfTables

PROB_BITS = 16
RANS16_L = 1 << 16
CHUNKED_TAG = 0x02
SINGLE_TAG = 0x01
DEFAULT_STREAMS = 4096


def _pad_to_streams(n: int, num_streams: int) -> Tuple[int, int]:
    per = -(-n // num_streams)  # ceil
    return per, per * num_streams


_UNROLL = 8


@functools.partial(jax.jit, static_argnames=("num_streams",))
def _encode_kernel(
    symbols: jax.Array,      # (N,) int32
    indexes: jax.Array,      # (N,) int32 channel ids
    cdf: jax.Array,          # (C, Lc) uint32 (values < 2^16 except last)
    cdf_length: jax.Array,   # (C,) int32
    offsets: jax.Array,      # (C,) int32
    num_streams: int,
):
    """Returns (words (L, S) uint16 emission-order dense grid,
    flags (L, S) bool, states (S,) uint32, escape_count ()).

    The scan body handles _UNROLL consecutive symbols per step: the per-
    symbol work is tiny vector math, so scan-step latency dominates — an
    8x unroll cuts the sequential step count 8x at identical total work.
    """
    n = symbols.shape[0]
    L, padded = _pad_to_streams(n, num_streams)
    # Round the per-stream length up to the unroll factor.
    L = -(-L // _UNROLL) * _UNROLL
    padded = L * num_streams
    S = num_streams
    # Stream s owns symbols [s*L, (s+1)*L); padding symbols are masked out.
    pad = padded - n
    sym = jnp.pad(symbols, (0, pad)).reshape(S, L)
    idx = jnp.pad(indexes, (0, pad)).reshape(S, L)
    valid = (
        jnp.pad(jnp.ones((n,), jnp.bool_), (0, pad), constant_values=False)
    ).reshape(S, L)

    max_v = cdf_length - 2  # escape symbol id per channel

    def one(state, j):
        # Process symbol column j (reverse order handled by the caller).
        s_val = sym[:, j]
        c = idx[:, j]
        v = s_val - offsets[c]
        mv = max_v[c]
        esc = (v < 0) | (v >= mv)
        coded = jnp.where(esc, mv, v)
        start = cdf[c, coded].astype(jnp.uint32)
        freq = (cdf[c, coded + 1] - cdf[c, coded]).astype(jnp.uint32)
        is_valid = valid[:, j]

        x = state
        x_max = freq << PROB_BITS
        emit = (x >= x_max) & is_valid
        word = (x & 0xFFFF).astype(jnp.uint16)
        x = jnp.where(emit, x >> 16, x)
        x_new = ((x // freq) << PROB_BITS) + (x % freq) + start
        state = jnp.where(is_valid, x_new, x)
        n_esc = jnp.sum(jnp.where(is_valid, esc, False).astype(jnp.int32))
        return state, word, emit, n_esc

    def body(state, i):
        words, emits, escs = [], [], []
        for k in range(_UNROLL):
            # Reversed symbol order: step i, slot k -> column L-1-(i*U+k).
            j = L - 1 - (i * _UNROLL + k)
            state, word, emit, n_esc = one(state, j)
            words.append(word)
            emits.append(emit)
            escs.append(n_esc)
        return state, (
            jnp.stack(words), jnp.stack(emits), sum(escs)
        )

    init = jnp.full((S,), RANS16_L, jnp.uint32)
    states, (words, flags, escs) = jax.lax.scan(
        body, init, jnp.arange(L // _UNROLL, dtype=jnp.int32)
    )
    # (L/U, U, S) -> (L, S) in emission order
    words = words.reshape(L, S)
    flags = flags.reshape(L, S)
    return words, flags, states, jnp.sum(escs)


@functools.partial(jax.jit, static_argnames=())
def _compact_kernel(words: jax.Array, flags: jax.Array):
    """Sort-based stream compaction: per stream, gather flagged words to the
    front preserving emission order. Returns (compact (L, S) uint16,
    lengths (S,) int32, max_len ())."""
    L, S = words.shape
    order = jax.lax.broadcasted_iota(jnp.uint32, (L, S), 0)
    keys = jnp.where(flags, order, jnp.uint32(0xFFFFFFFF))
    # Sort along axis 0 per stream; payload follows keys.
    _, compact = jax.lax.sort(
        (keys, words.astype(jnp.uint16)), dimension=0, num_keys=1
    )
    lengths = jnp.sum(flags.astype(jnp.int32), axis=0)
    return compact, lengths, jnp.max(lengths)


_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return n


class DeviceRansEncoder:
    """Encodes (1|B, h, w, C) latent symbol tensors on device into chunked
    rANS16 payloads; falls back to None when escapes are present (caller
    should use the host coder)."""

    def __init__(self, tables: CdfTables, num_streams: int = DEFAULT_STREAMS):
        self.tables = tables
        self.num_streams = num_streams
        self._cdf = jnp.asarray(tables.quantized_cdf, jnp.uint32)
        self._cdf_len = jnp.asarray(tables.cdf_length, jnp.int32)
        self._off = jnp.asarray(tables.offset, jnp.int32)

    def encode_device(self, sym_dev: jax.Array):
        """sym_dev: (h*w*C,) or (1,h,w,C) int device array of symbols
        (round(y - median)). Returns device handles for async download:
        (compact_words, lengths, states, escape_count, n_symbols)."""
        if sym_dev.ndim == 4:
            c = sym_dev.shape[-1]
            flat = sym_dev.reshape(-1).astype(jnp.int32)
            idx = jnp.tile(
                jnp.arange(c, dtype=jnp.int32), flat.shape[0] // c
            )
        else:
            raise ValueError("expected (1, h, w, C) symbols")
        words, flags, states, esc = _encode_kernel(
            flat, idx, self._cdf, self._cdf_len, self._off, self.num_streams
        )
        compact, lengths, max_len = _compact_kernel(words, flags)
        # words.shape[0] is the (unroll-padded) per-stream symbol count L;
        # it goes into the header so decoders derive stream ownership.
        return compact, lengths, states, esc, flat.shape[0], words.shape[0]

    def assemble(
        self, compact, lengths, states, esc, n_symbols, stream_len
    ) -> Optional[bytes]:
        """Host side: download the compacted grid (bucketed rows) and build
        the payload. Returns None if escapes were present."""
        if int(np.asarray(esc)) != 0:
            return None
        lens = np.asarray(lengths)
        states_np = np.asarray(states, np.uint32)
        max_len = int(lens.max()) if lens.size else 0
        L = compact.shape[0]
        rows = min(_bucket(max_len), L)
        # Download only the valid prefix rows (bucketed: few compiled slices)
        grid = np.asarray(compact[:rows]) if rows else np.zeros(
            (0, compact.shape[1]), np.uint16
        )
        S = grid.shape[1]
        out = [
            struct.pack("<BIHI", CHUNKED_TAG, n_symbols, S, stream_len),
        ]
        stream_bytes: List[bytes] = []
        for s in range(S):
            k = int(lens[s])
            st = int(states_np[s])
            # Decode order: state high word, state low word, then emitted
            # words reversed.
            words = np.empty(k + 2, np.uint16)
            words[0] = (st >> 16) & 0xFFFF
            words[1] = st & 0xFFFF
            if k:
                words[2:] = grid[:k, s][::-1]
            stream_bytes.append(words.astype("<u2").tobytes())
        out.append(
            np.asarray([len(b) for b in stream_bytes], "<u4").tobytes()
        )
        out.extend(stream_bytes)
        return b"".join(out)


def parse_chunked_header(payload: bytes):
    """-> (n_symbols, S, stream_len, [(offset, length)])"""
    tag, n_symbols, S, stream_len = struct.unpack("<BIHI", payload[:11])
    if tag != CHUNKED_TAG:
        raise ValueError(f"not a chunked payload (tag {tag})")
    lens = np.frombuffer(payload[11 : 11 + 4 * S], "<u4")
    off = 11 + 4 * S
    spans = []
    for ln in lens:
        spans.append((off, int(ln)))
        off += int(ln)
    return n_symbols, S, stream_len, spans


def decode_chunked_py(
    payload: bytes, indexes: np.ndarray, tables: CdfTables
) -> np.ndarray:
    """Pure-Python reference decoder for chunked rANS16 payloads (the
    executable spec for the C++ rdvc_rans16_decode)."""
    n_symbols, S, L, spans = parse_chunked_header(payload)
    assert indexes.shape[0] == n_symbols
    out = np.zeros(n_symbols, np.int32)
    cdf = tables.quantized_cdf
    cdf_len = tables.cdf_length
    off = tables.offset
    for s, (o, ln) in enumerate(spans):
        words = np.frombuffer(payload[o : o + ln], "<u2")
        state = (int(words[0]) << 16) | int(words[1])
        pos = 2
        base = s * L
        count = min(L, n_symbols - base)
        for t in range(count):
            c = int(indexes[base + t])
            row = cdf[c]
            cl = int(cdf_len[c])
            cum = state & 0xFFFF
            sidx = int(np.searchsorted(row[:cl], cum, side="right")) - 1
            sidx = min(sidx, cl - 2)
            start = int(row[sidx])
            freq = int(row[sidx + 1]) - start
            state = freq * (state >> PROB_BITS) + cum - start
            if state < RANS16_L:
                state = (state << 16) | int(words[pos])
                pos += 1
            if sidx == cl - 2:
                raise ValueError("escape symbol in chunked stream")
            out[base + t] = sidx + int(off[c])
    return out
