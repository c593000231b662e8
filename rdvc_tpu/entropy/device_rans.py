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


def _geometric_buckets(lo: int = 64, hi: int = 1 << 28):
    """Slice-size buckets: powers of two plus 1.5x intermediates, capping
    download padding waste at ~33% while keeping the number of compiled
    slice shapes logarithmic."""
    out = []
    b = lo
    while b < hi:
        out.append(b)
        out.append(b + b // 2)
        b <<= 1
    return tuple(out)


_BUCKETS = _geometric_buckets()


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return n


@functools.partial(jax.jit, static_argnames=("num_streams",))
def _encode_batch_kernel(
    symbols: jax.Array,      # (B, N) int32
    indexes: jax.Array,      # (N,) int32 channel ids (same layout per frame)
    cdf: jax.Array,
    cdf_length: jax.Array,
    offsets: jax.Array,
    num_streams: int,
):
    """vmapped rANS16 encode over a batch of frames: one dispatch encodes
    every frame's symbol tensor. Returns ((B,L,S) words, (B,L,S) flags,
    (B,S) states, (B,) escape counts)."""
    enc = jax.vmap(
        lambda s: _encode_kernel(
            s, indexes, cdf, cdf_length, offsets, num_streams
        )
    )
    return enc(symbols)


@jax.jit
def _compact_batch_kernel(words: jax.Array, flags: jax.Array):
    """(B, L, S) -> per-frame sort compaction in one dispatch."""
    compact, lengths, _ = jax.vmap(_compact_kernel)(words, flags)
    return compact, lengths, jnp.max(lengths)


def _flatten_kernel(words: jax.Array, flags: jax.Array):
    """(L, S) emission-order grid -> exact stream-major payload order.

    One global lax.sort whose key encodes (stream, reversed emission rank):
    flagged words land at the front in exactly the order the payload needs
    (stream s's words, last emitted first), unflagged slots sink to the
    end. The host then downloads only the valid prefix — the download is
    payload-sized instead of (padded stream length x S)-sized.
    """
    L, S = words.shape
    ranks = jnp.cumsum(flags.astype(jnp.int32), axis=0) - 1  # (L, S)
    k = jnp.sum(flags.astype(jnp.int32), axis=0)             # (S,)
    stream = jax.lax.broadcasted_iota(jnp.uint32, (L, S), 1)
    rev = (k[None, :] - 1 - ranks).astype(jnp.uint32)
    key = jnp.where(
        flags, stream * jnp.uint32(L) + rev, jnp.uint32(0xFFFFFFFF)
    )
    _, flat = jax.lax.sort(
        (key.reshape(-1), words.reshape(-1)), dimension=0, num_keys=1
    )
    return flat, k


@jax.jit
def _flatten_batch_kernel(words: jax.Array, flags: jax.Array):
    """(B, L, S) -> ((B, L*S) stream-major words, (B, S) lengths,
    (B,) totals) in one dispatch."""
    flat, k = jax.vmap(_flatten_kernel)(words, flags)
    return flat, k, jnp.sum(k, axis=1)


class DeviceRansEncoder:
    """Encodes (B, h, w, C) latent symbol tensors on device into chunked
    rANS16 payloads; falls back to None when escapes are present (caller
    should use the host coder)."""

    def __init__(self, tables: CdfTables, num_streams: int = DEFAULT_STREAMS):
        self.tables = tables
        self.num_streams = num_streams
        self._cdf = jnp.asarray(tables.quantized_cdf, jnp.uint32)
        self._cdf_len = jnp.asarray(tables.cdf_length, jnp.int32)
        self._off = jnp.asarray(tables.offset, jnp.int32)

    def encode_device(self, sym_dev: jax.Array):
        """Single-frame convenience wrapper around encode_device_batch."""
        if sym_dev.ndim != 4:
            raise ValueError("expected (1, h, w, C) symbols")
        return self.encode_device_batch(sym_dev)

    def encode_device_batch(self, sym_dev: jax.Array):
        """sym_dev: (B, h, w, C) int device array of symbols
        (round(y - median)). TWO device dispatches for the whole batch.
        Returns handles for assemble_batch:
        (flat_words (B, L*S) stream-major, lengths (B,S), totals (B,),
        states (B,S), esc (B,), n_symbols_per_frame, stream_len L)."""
        B, h, w, c = sym_dev.shape
        flat = sym_dev.reshape(B, -1).astype(jnp.int32)
        idx = jnp.tile(jnp.arange(c, dtype=jnp.int32), h * w)
        words, flags, states, esc = _encode_batch_kernel(
            flat, idx, self._cdf, self._cdf_len, self._off, self.num_streams
        )
        flat_words, lengths, totals = _flatten_batch_kernel(words, flags)
        # words.shape[1] is the (unroll-padded) per-stream symbol count L;
        # it goes into the header so decoders derive stream ownership.
        return (
            flat_words, lengths, totals, states, esc,
            flat.shape[1], words.shape[1],
        )

    def assemble(
        self, flat_words, lengths, totals, states, esc, n_symbols, stream_len
    ):
        """Single-frame payload (see assemble_batch)."""
        return self.assemble_batch(
            flat_words, lengths, totals, states, esc, n_symbols, stream_len
        )[0]

    def assemble_batch(
        self, flat_words, lengths, totals, states, esc, n_symbols, stream_len
    ) -> List[Optional[bytes]]:
        """Host side: download the exact stream-major word prefix (one
        bucketed slice for the whole batch — payload-sized, not padded-grid
        -sized) and splice in the per-stream state words with vectorized
        numpy. Frames with escapes yield None."""
        esc_np = np.asarray(esc)
        lens = np.asarray(lengths)                  # (B, S)
        totals_np = np.asarray(totals)              # (B,)
        states_np = np.asarray(states, np.uint32)   # (B, S)
        B, S = lens.shape
        cap = flat_words.shape[1]
        max_total = int(totals_np.max()) if totals_np.size else 0
        cols = min(_bucket(max_total), cap)
        if cols:
            words_np = np.asarray(flat_words[:, :cols])  # (B, cols)
        else:
            words_np = np.zeros((B, 0), np.uint16)

        out: List[Optional[bytes]] = []
        for b in range(B):
            if int(esc_np[b]) != 0:
                out.append(None)
                continue
            k = lens[b].astype(np.int64)            # (S,)
            total = int(totals_np[b])
            # Payload word layout per stream: [state_hi, state_lo,
            # reversed emitted words]; streams back to back. Data word i of
            # the stream-major flat buffer belongs to stream sid[i] and
            # lands 2*(sid[i]+1) slots later once states are spliced in.
            buf = np.zeros(total + 2 * S, np.uint16)
            sid = np.repeat(np.arange(S, dtype=np.int64), k)
            prefix = np.concatenate(([0], np.cumsum(k)[:-1]))
            state_pos = prefix + 2 * np.arange(S, dtype=np.int64)
            buf[state_pos] = (states_np[b] >> 16).astype(np.uint16)
            buf[state_pos + 1] = (states_np[b] & 0xFFFF).astype(np.uint16)
            buf[np.arange(total, dtype=np.int64) + 2 * (sid + 1)] = (
                words_np[b, :total]
            )
            byte_lens = (2 * (k + 2)).astype("<u4")
            payload = b"".join(
                (
                    struct.pack("<BIHI", CHUNKED_TAG, n_symbols, S, stream_len),
                    byte_lens.tobytes(),
                    buf.astype("<u2").tobytes(),
                )
            )
            out.append(payload)
        return out


_DEC_UNROLL = 8


@functools.partial(jax.jit, static_argnames=("L", "C", "n_symbols"))
def _decode_batch_kernel(
    grids: jax.Array,     # (B, Wmax, S) uint16 word grids (decode order)
    lut: jax.Array,       # (C * 65536,) int32: cum -> symbol index
    cdf_flat: jax.Array,  # (C * Lc,) uint32 flattened CDF rows
    row_stride: int,
    offsets: jax.Array,   # (C,) int32
    L: int,
    C: int,
    n_symbols: int,
):
    """Batched chunked-rANS16 decode on device.

    Mirrors decode_chunked_py exactly: per stream, L sequential symbol
    steps; each step reads the symbol via a dense 2^16-entry LUT (one
    gather instead of a binary search), updates the state, and conditionally
    consumes the next word. All B payloads x S streams advance in lockstep
    on the VPU. Returns (B, n_symbols) int32 symbols (offsets applied).
    """
    Bb, Wmax, S = grids.shape
    flat = grids.reshape(Bb, Wmax * S)

    state = (grids[:, 0, :].astype(jnp.uint32) << 16) | grids[
        :, 1, :
    ].astype(jnp.uint32)                       # (B, S)
    pos = jnp.full((Bb, S), 2, jnp.int32)
    # Channel of stream s at step t: (s*L + t) % C.
    c0 = (jnp.arange(S, dtype=jnp.int32) * L) % C

    def one(carry, t):
        state, pos = carry
        c = (c0 + t) % C                       # (S,)
        cum = (state & 0xFFFF).astype(jnp.int32)
        sidx = lut[c[None, :] * 65536 + cum]   # (B, S) gather
        base = c * row_stride
        start = cdf_flat[base[None, :] + sidx]
        freq = cdf_flat[base[None, :] + sidx + 1] - start
        state = freq * (state >> 16) + cum.astype(jnp.uint32) - start
        need = state < RANS16_L
        word = jnp.take_along_axis(
            flat, pos * S + jnp.arange(S, dtype=jnp.int32)[None, :], axis=1
        ).astype(jnp.uint32)
        state = jnp.where(need, (state << 16) | word, state)
        pos = pos + need.astype(jnp.int32)
        sym = sidx + offsets[c][None, :]
        return (state, pos), sym.astype(jnp.int32)

    def body(carry, i):
        syms = []
        for k in range(_DEC_UNROLL):
            carry, sym = one(carry, i * _DEC_UNROLL + k)
            syms.append(sym)
        return carry, jnp.stack(syms)          # (U, B, S)

    n_steps = L // _DEC_UNROLL
    (_, _), out = jax.lax.scan(
        body, (state, pos), jnp.arange(n_steps, dtype=jnp.int32)
    )                                           # (n_steps, U, B, S)
    # (steps*U, B, S) -> (B, S, L): stream s owns symbols [s*L, (s+1)*L).
    out = out.reshape(L, Bb, S).transpose(1, 2, 0).reshape(Bb, S * L)
    return out[:, :n_symbols]


class DeviceRansDecoder:
    """Decodes chunked rANS16 payloads ON DEVICE: the host uploads only the
    compressed word grids (~bpp/8 bytes per pixel) and the symbols never
    leave the device. All payloads of a batch decode in one kernel."""

    def __init__(self, tables: CdfTables):
        self.tables = tables
        cdf = tables.quantized_cdf
        C, Lc = cdf.shape
        self._row_stride = Lc
        self._cdf_flat = jnp.asarray(cdf.reshape(-1), jnp.uint32)
        self._off = jnp.asarray(tables.offset, jnp.int32)
        self._C = C
        # Dense cum -> symbol-index LUT (uint16 rows would save HBM but the
        # gather output is int32 anyway).
        lut = np.empty((C, 65536), np.int32)
        cum = np.arange(65536)
        for c in range(C):
            cl = int(tables.cdf_length[c])
            row = cdf[c, :cl]
            lut[c] = np.minimum(
                np.searchsorted(row, cum, side="right") - 1, cl - 2
            )
        self._lut = jnp.asarray(lut.reshape(-1))

    def prepare_grids(self, payloads: List[bytes]):
        """Parse + pack chunked payloads into one (B, Wmax, S) uint16 grid
        (host side; cheap). All payloads must share S and L (same tensor
        shape — true within a pipeline run). Returns (grid, n_symbols, L)."""
        metas = [parse_chunked_header(p) for p in payloads]
        n_symbols, S, L = metas[0][0], metas[0][1], metas[0][2]
        for m in metas:
            if (m[0], m[1], m[2]) != (n_symbols, S, L):
                raise ValueError("inconsistent chunked payload shapes")
        max_words = max(max(ln for _, ln in m[3]) // 2 for m in metas)
        rows = _bucket(max_words)
        B = len(payloads)
        grid = np.zeros((B, rows, S), np.uint16)
        col = np.arange(rows, dtype=np.int64)[None, :]
        for b, (payload, m) in enumerate(zip(payloads, metas)):
            spans = m[3]
            first = spans[0][0]
            # Streams are stored back to back: one frombuffer + a masked
            # scatter fills the whole grid (no per-stream Python loop).
            words = np.frombuffer(
                payload, "<u2", offset=first,
                count=(spans[-1][0] + spans[-1][1] - first) // 2,
            )
            wl = np.asarray([ln // 2 for _, ln in spans], np.int64)  # (S,)
            buf = np.zeros((S, rows), np.uint16)
            buf[col < wl[:, None]] = words
            grid[b] = buf.T
        return grid, n_symbols, L

    def decode_device(self, payloads: List[bytes]) -> jax.Array:
        """[chunked payloads] -> (B, n_symbols) int32 device symbols."""
        grid, n_symbols, L = self.prepare_grids(payloads)
        return _decode_batch_kernel(
            jnp.asarray(grid), self._lut, self._cdf_flat, self._row_stride,
            self._off, L, self._C, n_symbols,
        )


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
