"""Device-side Gaussian-conditional rANS16 (TPU-native hyperprior y-coder).

The host hyperprior path (codec_runtime.hyper_compress, payload tag 0x04)
downloads per-element (mu, sigma) to quantize and index on the host —
~8 bytes/element, 100x the compressed size, untenable over the relay
link. This coder keeps everything on device: symbols = round(y - mu) and
scale bins = scale_indexes(sigma) are computed where mu/sigma already
live, the multistream rANS16 kernels emit the compressed words, and only
payload-sized bytes cross the link (same philosophy as the channel-aligned
coder, device_rans.py).

The channel-aligned trick (per-STREAM constant CDF row) does not apply:
the Gaussian row is per-ELEMENT (its scale bin). Gathers serialize per
index on TPU, so the row select is reformulated as an EXACT f32 matmul on
the MXU: one-hot(bin) (B*S, n_bins) @ table (n_bins, M) — every output
element is a single selected table value (all other terms are 0*x), so
f32 accumulation is exact for values <= 2^16.

Device tables are the FIRST `n_bins` rows of the host Gaussian tables
(entropy/gaussian.py), bit-identical pmfs — the two payload formats (0x04
host / 0x05 device) differ only in transport layout. Frames containing
any element with bin >= n_bins or a symbol in a row's escape slot fall
back to the host coder (policy mirrors the 0x03 coder's escape fallback);
after training, sigma concentrates far below the cutoff.

Bins are NOT stored in the payload: encoder and decoder both derive them
from the SAME quantized hyper-latent z on the SAME device, so they agree
structurally (CLAUDE.md invariant: never mix devices across an
encode/decode pair).

Bitstream format (payload tag 0x05, "bin-indexed chunked rANS16"):
    [u8 0x05][u32 n_symbols][u16 S][u32 stream_len L][u32 byte_len[S]]
    [stream bytes...]
Identical body layout to tag 0x03: per stream [state_hi, state_lo,
emitted words reversed], little-endian uint16. Stream s codes elements
[s*L, (s+1)*L) of the flat tensor-order symbol array.
"""

from __future__ import annotations

import functools
import struct
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rdvc_tpu.entropy.factorized import CdfTables
from rdvc_tpu.entropy.device_rans import (
    PROB_BITS,
    RANS16_L,
    _bucket,
    _flatten_batch_kernel,
    _pack_assemble_meta,
)

BIN_TAG = 0x05
DEFAULT_BINS = 40  # sigma <= ~13.4 on the default 64-bin scale table
_UNROLL = 4
_DEC_UNROLL = 8
DEFAULT_STREAMS = 4096


def bin_stream_layout(n: int, target_streams: int = DEFAULT_STREAMS):
    """(S, L) for n flat symbols: S streams of L symbols (unroll-padded).
    Element e belongs to stream e // L at position e % L."""
    S = min(target_streams, max(1, n))
    L = -(-n // S)
    L = -(-L // max(_UNROLL, _DEC_UNROLL)) * max(_UNROLL, _DEC_UNROLL)
    return S, L


def device_gaussian_rows(tables: CdfTables, n_bins: int = DEFAULT_BINS):
    """First n_bins rows of the host Gaussian tables as dense device
    constants: (start (nb, M), freq (nb, M), cdf_padded (nb, M+1),
    max_v (nb,), offs (nb,)). M = widest kept row's pmf length (incl.
    escape); cdf_padded pads with 2^16 so dead entries never match the
    decode comparison-sum."""
    nb = int(n_bins)
    cdf = np.asarray(tables.quantized_cdf, np.int64)[:nb]
    lens = np.asarray(tables.cdf_length, np.int64)[:nb]
    M = int(lens.max()) - 1  # symbols per row (cdf has M+1 edges)
    start = np.zeros((nb, M), np.uint32)
    freq = np.zeros((nb, M), np.uint32)
    cdfp = np.full((nb, M + 1), 1 << 16, np.int64)
    for b in range(nb):
        m = int(lens[b]) - 1
        start[b, :m] = cdf[b, :m]
        freq[b, :m] = cdf[b, 1 : m + 1] - cdf[b, :m]
        cdfp[b, : m + 1] = cdf[b, : m + 1]
    return (
        jnp.asarray(start),
        jnp.asarray(freq),
        jnp.asarray(cdfp, jnp.uint32),
        jnp.asarray(lens - 2, jnp.int32),  # escape id per row
        jnp.asarray(tables.offset[:nb], jnp.int32),
    )


def _select_rows(onehot_f32: jax.Array, table: jax.Array) -> jax.Array:
    """(B, S, nb) one-hot @ (nb, M) table -> (B, S, M) selected rows.
    Exact: each output is one table value (others multiply by 0)."""
    return jnp.einsum(
        "bsn,nm->bsm", onehot_f32, table.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("S", "L"))
def _encode_bin_batch_kernel(
    symbols: jax.Array,  # (B, N) int32 flat tensor-order symbols
    bins: jax.Array,     # (B, N) int32 per-element scale bins
    start_rows: jax.Array,  # (nb, M) uint32
    freq_rows: jax.Array,   # (nb, M) uint32
    max_v: jax.Array,       # (nb,) int32 escape id per bin
    offs: jax.Array,        # (nb,) int32 offset per bin
    S: int,
    L: int,
):
    """Bin-indexed rANS16 encode. Returns ((B, L, S) words, flags,
    (B, S) states, (B,) escape counts)."""
    Bb, N = symbols.shape
    nb, M = start_rows.shape
    pad = S * L - N
    grid = jnp.pad(symbols, ((0, 0), (0, pad))).reshape(Bb, S, L)
    bgrid = jnp.pad(bins, ((0, 0), (0, pad))).reshape(Bb, S, L)
    e_of = (
        jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) * L
        + jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    )
    valid_grid = e_of < N  # (S, L)
    kb = jnp.arange(nb, dtype=jnp.int32)[None, None, :]  # (1, 1, nb)
    km = jnp.arange(M, dtype=jnp.int32)[None, None, :]   # (1, 1, M)

    def one(state, j):
        s_val = grid[:, :, j]                      # (B, S)
        b_val = bgrid[:, :, j]
        bin_ok = (b_val >= 0) & (b_val < nb)
        b_safe = jnp.clip(b_val, 0, nb - 1)
        oh_bin = (kb == b_safe[..., None]).astype(jnp.float32)
        # Per-element bin constants via tiny comparison-sums over nb.
        off_e = jnp.sum(
            jnp.where(kb == b_safe[..., None], offs[None, None], 0), -1
        )
        mv_e = jnp.sum(
            jnp.where(kb == b_safe[..., None], max_v[None, None], 0), -1
        )
        v = s_val - off_e
        esc = (~bin_ok) | (v < 0) | (v >= mv_e)
        coded = jnp.where(esc, jnp.minimum(mv_e, M - 1), v)  # (B, S)
        # Row select on the MXU (exact one-hot matmul), then symbol select.
        row_start = _select_rows(oh_bin, start_rows)  # (B, S, M) f32
        row_freq = _select_rows(oh_bin, freq_rows)
        oh_sym = km == coded[..., None]
        start = jnp.sum(
            jnp.where(oh_sym, row_start, 0.0), -1
        ).astype(jnp.uint32)
        freq = jnp.maximum(
            jnp.sum(jnp.where(oh_sym, row_freq, 0.0), -1).astype(
                jnp.uint32
            ),
            jnp.uint32(1),  # padded/escaped lanes: keep the math defined
        )
        is_valid = valid_grid[:, j][None, :]

        x = state
        x_max = freq << PROB_BITS
        emit = (x >= x_max) & is_valid
        word = (x & 0xFFFF).astype(jnp.uint16)
        x = jnp.where(emit, x >> 16, x)
        x_new = ((x // freq) << PROB_BITS) + (x % freq) + start
        state = jnp.where(is_valid, x_new, x)
        n_esc = jnp.sum((esc & is_valid).astype(jnp.int32), axis=1)
        return state, word, emit, n_esc

    def body(state, i):
        words, emits, escs = [], [], []
        for k in range(_UNROLL):
            j = L - 1 - (i * _UNROLL + k)  # reversed symbol order
            state, word, emit, n_esc = one(state, j)
            words.append(word)
            emits.append(emit)
            escs.append(n_esc)
        return state, (jnp.stack(words), jnp.stack(emits), sum(escs))

    init = jnp.full((Bb, S), RANS16_L, jnp.uint32)
    states, (words, flags, escs) = jax.lax.scan(
        body, init, jnp.arange(L // _UNROLL, dtype=jnp.int32)
    )
    words = words.reshape(L, Bb, S).transpose(1, 0, 2)
    flags = flags.reshape(L, Bb, S).transpose(1, 0, 2)
    return words, flags, states, jnp.sum(escs, axis=0)


@functools.partial(jax.jit, static_argnames=("S", "L", "n"))
def _decode_bin_batch_kernel(
    grids: jax.Array,     # (B, Wmax, S) uint16 word grids (decode order)
    bins: jax.Array,      # (B, N) int32 per-element scale bins
    cdf_rows: jax.Array,  # (nb, M+1) uint32, padded 2^16
    offs: jax.Array,      # (nb,) int32
    S: int,
    L: int,
    n: int,
):
    """Bin-indexed rANS16 decode -> (B, n) int32 flat symbols."""
    Bb, Wmax, _ = grids.shape
    nb, M1 = cdf_rows.shape
    pad = S * L - n
    bgrid = jnp.pad(bins, ((0, 0), (0, pad))).reshape(Bb, S, L)
    bgrid_T = bgrid.transpose(2, 0, 1)  # (L, B, S) — scan xs
    state = (grids[:, 0, :].astype(jnp.uint32) << 16) | grids[
        :, 1, :
    ].astype(jnp.uint32)
    pos = jnp.full((Bb, S), 2, jnp.int32)
    lane = jnp.arange(S, dtype=jnp.int32)[None, :]
    # 16-word fetch blocks (2 slice-gathers per 16 symbols): gather-index
    # count is the serial cost of this kernel — see the CA kernel's
    # blocked-window comment in device_rans.py. L is a multiple of 8, so
    # an 8-symbol tail body covers the odd half-block.
    BODY = 16
    padW = (-Wmax) % BODY
    if padW:
        grids = jnp.pad(grids, ((0, 0), (0, padW), (0, 0)))
    W16 = (Wmax + padW) // BODY
    W2 = (
        grids.reshape(Bb, W16, BODY, S)
        .transpose(0, 1, 3, 2)
        .reshape(Bb, W16 * S, BODY)
    )
    kb = jnp.arange(nb, dtype=jnp.int32)[None, None, :]
    kk32 = jnp.arange(2 * BODY, dtype=jnp.int32)[None, None, :]
    km1 = jnp.arange(M1, dtype=jnp.int32)[None, None, :]

    def one(carry, b_val, window, base):
        state, pos = carry
        b_safe = jnp.clip(b_val, 0, nb - 1)
        oh_bin = (kb == b_safe[..., None]).astype(jnp.float32)
        rows = _select_rows(oh_bin, cdf_rows)       # (B, S, M+1) f32
        cum = (state & 0xFFFF).astype(jnp.uint32)
        ge = rows <= cum[..., None].astype(jnp.float32)
        sidx = jnp.sum(ge.astype(jnp.int32), axis=-1) - 1
        start = jnp.sum(
            jnp.where(km1 == sidx[..., None], rows, 0.0), -1
        ).astype(jnp.uint32)
        nxt = jnp.sum(
            jnp.where(km1 == (sidx + 1)[..., None], rows, 0.0), -1
        ).astype(jnp.uint32)
        freq = nxt - start
        state = freq * (state >> 16) + cum - start
        need = state < RANS16_L
        local = (pos - base)[..., None]
        word = jnp.sum(
            jnp.where(kk32 == local, window, 0), -1, dtype=jnp.uint32
        )
        state = jnp.where(need, (state << 16) | word, state)
        pos = pos + need.astype(jnp.int32)
        off_e = jnp.sum(
            jnp.where(kb == b_safe[..., None], offs[None, None], 0), -1
        )
        return (state, pos), sidx + off_e

    def make_body(n_sym):
        def body(carry, xs):
            state, pos = carry
            b_slice = xs  # (n_sym, B, S)
            b0 = pos >> 4
            b1 = jnp.minimum(b0 + 1, W16 - 1)
            f0 = jnp.take_along_axis(W2, (b0 * S + lane)[..., None], axis=1)
            f1 = jnp.take_along_axis(W2, (b1 * S + lane)[..., None], axis=1)
            window = jnp.concatenate([f0, f1], axis=-1).astype(jnp.uint32)
            base = b0 << 4
            carry = (state, pos)
            syms = []
            for k in range(n_sym):
                carry, sym = one(carry, b_slice[k], window, base)
                syms.append(sym)
            return carry, jnp.stack(syms)

        return body

    n_full = L // BODY
    tail = L - n_full * BODY                       # 0 or 8 (L % 8 == 0)
    carry = (state, pos)
    outs = []
    if n_full:
        xs = bgrid_T[: n_full * BODY].reshape(n_full, BODY, Bb, S)
        carry, out_full = jax.lax.scan(make_body(BODY), carry, xs)
        outs.append(out_full.reshape(n_full * BODY, Bb, S))
    if tail:
        _, out_tail = make_body(tail)(carry, bgrid_T[n_full * BODY :])
        outs.append(out_tail)
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    out = out.transpose(1, 2, 0).reshape(Bb, S * L)
    return out[:, :n].astype(jnp.int32)


class DeviceGaussianEncoder:
    """Encodes (B, N) flat Gaussian symbols + bins on device into
    bin-indexed chunked rANS16 payloads (tag 0x05); frames with escapes
    yield None from assemble (caller falls back to the host coder)."""

    def __init__(
        self,
        tables: CdfTables,
        n_bins: int = DEFAULT_BINS,
        num_streams: int = DEFAULT_STREAMS,
    ):
        self.tables = tables
        self.n_bins = n_bins
        self.target_streams = num_streams
        (
            self._start_rows,
            self._freq_rows,
            self._cdf_rows,
            self._max_v,
            self._offs,
        ) = device_gaussian_rows(tables, n_bins)

    def encode_device_batch(self, sym_dev: jax.Array, bins_dev: jax.Array):
        """(B, N) int32 symbols + bins -> handles for assemble_batch."""
        B, N = sym_dev.shape
        S, L = bin_stream_layout(N, self.target_streams)
        words, flags, states, esc = _encode_bin_batch_kernel(
            sym_dev.astype(jnp.int32), bins_dev.astype(jnp.int32),
            self._start_rows, self._freq_rows, self._max_v, self._offs,
            S, L,
        )
        flat_words, lengths, totals = _flatten_batch_kernel(words, flags)
        return flat_words, lengths, totals, states, esc, N, L

    def encode_traced(self, sym_dev: jax.Array, bins_dev: jax.Array):
        """Traceable encode+flatten+meta-pack for embedding inside a larger
        jit (the fused hyper encode): (B, N) symbols + bins ->
        ((B, L*S) stream-major words, (B, 2S+2) packed meta, L). The
        Gaussian table rows are checkpoint-independent constants, so
        (unlike the factorized coder's encode_consts) baking them into the
        trace can never go stale."""
        B, N = sym_dev.shape
        S, L = bin_stream_layout(N, self.target_streams)
        words, flags, states, esc = _encode_bin_batch_kernel(
            sym_dev.astype(jnp.int32), bins_dev.astype(jnp.int32),
            self._start_rows, self._freq_rows, self._max_v, self._offs,
            S, L,
        )
        flat_words, lengths, totals = _flatten_batch_kernel(words, flags)
        meta = _pack_assemble_meta(lengths, totals, states, esc)
        return flat_words, meta, L

    def assemble_batch(
        self, flat_words, lengths, totals, states, esc, n_symbols, stream_len
    ) -> List[Optional[bytes]]:
        from rdvc_tpu.entropy.device_rans import download_word_prefix_np

        meta = np.asarray(_pack_assemble_meta(lengths, totals, states, esc))
        words_np = download_word_prefix_np(flat_words, meta)
        return self.assemble_batch_np(words_np, meta, n_symbols, stream_len)

    def download_word_prefix(self, flat_words, meta_np) -> np.ndarray:
        from rdvc_tpu.entropy.device_rans import download_word_prefix_np

        return download_word_prefix_np(flat_words, meta_np)

    def assemble_batch_np(
        self, words_np, meta_np, n_symbols, stream_len
    ) -> List[Optional[bytes]]:
        """Shared splice (device_rans.splice_stream_payloads) with the
        bin-indexed tag — the 0x03/0x05 body layouts are identical."""
        from rdvc_tpu.entropy.device_rans import splice_stream_payloads

        return splice_stream_payloads(
            words_np, meta_np, n_symbols, stream_len, BIN_TAG
        )


class DeviceGaussianDecoder:
    """Decodes tag-0x05 payloads ON DEVICE given per-element bins (derived
    from the coded hyper-latent — never stored in the payload)."""

    def __init__(self, tables: CdfTables, n_bins: int = DEFAULT_BINS):
        self.tables = tables
        self.n_bins = n_bins
        rows = device_gaussian_rows(tables, n_bins)
        self._cdf_rows = rows[2]
        self._offs = rows[4]

    def prepare_grids(self, payloads: List[bytes]):
        metas = [parse_bin_header(p) for p in payloads]
        n_symbols, S, L = metas[0][0], metas[0][1], metas[0][2]
        for m in metas:
            if (m[0], m[1], m[2]) != (n_symbols, S, L):
                raise ValueError("inconsistent bin payload shapes")
        max_words = max(max(ln for _, ln in m[3]) // 2 for m in metas)
        rows = _bucket(max_words)
        B = len(payloads)
        grid = np.zeros((B, rows, S), np.uint16)
        col = np.arange(rows, dtype=np.int64)[None, :]
        for b, (payload, m) in enumerate(zip(payloads, metas)):
            spans = m[3]
            first = spans[0][0]
            words = np.frombuffer(
                payload, "<u2", offset=first,
                count=(spans[-1][0] + spans[-1][1] - first) // 2,
            )
            wl = np.asarray([ln // 2 for _, ln in spans], np.int64)
            buf = np.zeros((S, rows), np.uint16)
            buf[col < wl[:, None]] = words
            grid[b] = buf.T
        return grid, n_symbols, L

    def decode_device(
        self, payloads: List[bytes], bins_dev: jax.Array
    ) -> jax.Array:
        """payloads + (B, N) device bins -> (B, N) int32 device symbols."""
        grid, n_symbols, L = self.prepare_grids(payloads)
        S = grid.shape[2]
        return _decode_bin_batch_kernel(
            jnp.asarray(grid), bins_dev.astype(jnp.int32),
            self._cdf_rows, self._offs, S, L, n_symbols,
        )


def parse_bin_header(payload: bytes):
    """-> (n_symbols, S, stream_len, [(offset, length)])"""
    tag, n_symbols, S, stream_len = struct.unpack("<BIHI", payload[:11])
    if tag != BIN_TAG:
        raise ValueError(f"not a bin-indexed payload (tag {tag})")
    lens = np.frombuffer(payload[11 : 11 + 4 * S], "<u4")
    off = 11 + 4 * S
    spans = []
    for ln in lens:
        spans.append((off, int(ln)))
        off += int(ln)
    return n_symbols, S, stream_len, spans


def decode_bin(
    payload: bytes,
    bins: np.ndarray,
    tables: CdfTables,
    n_bins: int = DEFAULT_BINS,
    num_threads: int = 4,
) -> np.ndarray:
    """Host decode of a tag-0x05 payload: threaded C++ fast path
    (rdvc_rans16bin_decode) with the pure-Python executable spec as
    fallback. Used by host-only consumers; the pipeline decodes 0x05 on
    device (codec_runtime.decode_hyper_payloads_device)."""
    import ctypes

    from rdvc_tpu.entropy.rans.coder import _load_lib

    lib = _load_lib()
    if lib is None:
        return decode_bin_py(payload, bins, tables, n_bins)
    n_symbols = parse_bin_header(payload)[0]
    buf = np.ascontiguousarray(np.frombuffer(payload, np.uint8))
    bins_c = np.ascontiguousarray(np.asarray(bins, np.int32).ravel())
    if bins_c.shape[0] < n_symbols:
        raise ValueError("bins shorter than payload symbol count")
    cdfs = np.ascontiguousarray(tables.quantized_cdf, np.uint32)
    lens = np.ascontiguousarray(tables.cdf_length, np.int32)
    offs = np.ascontiguousarray(tables.offset, np.int32)
    out = np.zeros(n_symbols, np.int32)
    rc = lib.rdvc_rans16bin_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.shape[0],
        n_symbols,
        bins_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        min(n_bins, cdfs.shape[0]),
        cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cdfs.shape[1],
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads,
    )
    if rc != 0:
        raise RuntimeError(f"bin-indexed rANS decode failed: {rc}")
    return out


def decode_bin_py(
    payload: bytes,
    bins: np.ndarray,
    tables: CdfTables,
    n_bins: int = DEFAULT_BINS,
) -> np.ndarray:
    """Pure-Python reference decoder for tag-0x05 payloads — the
    executable spec the device kernel is tested against."""
    n_symbols, S, L, spans = parse_bin_header(payload)
    cdf = np.asarray(tables.quantized_cdf, np.int64)
    lens = np.asarray(tables.cdf_length, np.int64)
    off = np.asarray(tables.offset, np.int64)
    bins = np.asarray(bins, np.int64).ravel()
    out = np.zeros(n_symbols, np.int64)
    for s, (o, ln) in enumerate(spans):
        words = np.frombuffer(payload, "<u2", offset=o, count=ln // 2)
        state = (int(words[0]) << 16) | int(words[1])
        wpos = 2
        for t in range(L):
            e = s * L + t
            if e >= n_symbols:
                break
            b = int(bins[e])
            assert 0 <= b < n_bins, (e, b)
            m = int(lens[b]) - 1
            row = cdf[b, : m + 1]
            cum = state & 0xFFFF
            sidx = int(np.searchsorted(row, cum, side="right")) - 1
            start = int(row[sidx])
            freq = int(row[sidx + 1]) - start
            state = freq * (state >> 16) + cum - start
            if state < RANS16_L:
                w = int(words[wpos]) if wpos < len(words) else 0
                state = (state << 16) | w
                wpos += 1
            out[e] = sidx + int(off[b])
    return out.astype(np.int32)
