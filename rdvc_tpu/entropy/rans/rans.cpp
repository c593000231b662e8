// Host-side rANS range coder for rdvc_tpu.
//
// Fills the role of CompressAI's C++ `compressai.ans` rANS coder that the
// reference drives through EntropyBottleneck.compress/decompress
// (/root/reference/codec_processing.py:488,564,589). Fresh implementation of
// the classic byte-wise rANS construction (Duda 2013; public-domain ryg_rans
// structure): 32-bit state, byte renormalization, 16-bit quantized CDFs,
// plus a bypass path for out-of-range symbols via an escape symbol and
// 4-bit continuation chunks.
//
// Exposed as a plain C ABI for ctypes. Symbol convention matches
// rdvc_tpu.entropy.factorized.CdfTables: for element e with table row c,
//   v = symbol[e] - offset[c]; max_v = cdf_length[c] - 2;
//   if 0 <= v < max_v: coded directly; else escape (max_v) + bypass varint.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kProbBits = 16;
constexpr uint32_t kRansL = 1u << 23;  // lower bound of normalized interval
constexpr uint32_t kBypassBits = 4;
constexpr uint32_t kBypassMax = (1u << kBypassBits) - 1;

struct RansEncoder {
  uint32_t state = kRansL;
  std::vector<uint8_t> bytes;  // emitted in reverse; reversed at flush

  inline void put(uint32_t start, uint32_t freq) {
    uint32_t x = state;
    const uint32_t x_max = ((kRansL >> kProbBits) << 8) * freq;
    while (x >= x_max) {
      bytes.push_back(static_cast<uint8_t>(x & 0xff));
      x >>= 8;
    }
    state = ((x / freq) << kProbBits) + (x % freq) + start;
  }

  inline void put_bits(uint32_t val, uint32_t nbits) {
    uint32_t x = state;
    const uint32_t freq = 1u << (kProbBits - nbits);
    const uint32_t x_max = ((kRansL >> kProbBits) << 8) * freq;
    while (x >= x_max) {
      bytes.push_back(static_cast<uint8_t>(x & 0xff));
      x >>= 8;
    }
    state = ((x / freq) << kProbBits) + (x % freq) + (val << (kProbBits - nbits));
  }

  void flush(std::vector<uint8_t>* out) {
    uint32_t x = state;
    for (int i = 0; i < 4; ++i) {
      bytes.push_back(static_cast<uint8_t>(x & 0xff));
      x >>= 8;
    }
    out->assign(bytes.rbegin(), bytes.rend());
  }
};

struct RansDecoder {
  uint32_t state = 0;
  const uint8_t* ptr = nullptr;
  const uint8_t* end = nullptr;

  void init(const uint8_t* data, int64_t len) {
    ptr = data;
    end = data + len;
    state = 0;
    for (int i = 0; i < 4; ++i) {
      state = (state << 8) | next_byte();
    }
  }

  inline uint8_t next_byte() { return ptr < end ? *ptr++ : 0; }

  inline uint32_t peek() const { return state & ((1u << kProbBits) - 1); }

  inline void advance(uint32_t start, uint32_t freq) {
    uint32_t x = freq * (state >> kProbBits) + peek() - start;
    while (x < kRansL) {
      x = (x << 8) | next_byte();
    }
    state = x;
  }

  inline uint32_t get_bits(uint32_t nbits) {
    const uint32_t val = state >> (kProbBits - nbits) &
                         ((1u << nbits) - 1);
    // Equivalent advance for a uniform "symbol" of width 2^(prob-n).
    const uint32_t freq = 1u << (kProbBits - nbits);
    const uint32_t start = val << (kProbBits - nbits);
    advance(start, freq);
    return val;
  }
};

// Decode-order op list; encoding replays it reversed.
struct Op {
  uint32_t start;
  uint32_t freq;
  bool is_bits;
  uint32_t val;    // for bits
  uint32_t nbits;  // for bits
};

}  // namespace

extern "C" {

// Encode n symbols. Returns number of bytes written, or -1 if out_capacity
// is insufficient (call again with a larger buffer), -2 on bad args.
// cdfs: row-major (num_tables, cdf_stride) uint32.
int64_t rdvc_rans_encode(const int32_t* symbols, const int32_t* indexes,
                         int64_t n, const uint32_t* cdfs, int64_t cdf_stride,
                         const int32_t* cdf_lengths, const int32_t* offsets,
                         uint8_t* out, int64_t out_capacity) {
  std::vector<Op> ops;
  ops.reserve(static_cast<size_t>(n) + 16);
  for (int64_t e = 0; e < n; ++e) {
    const int32_t c = indexes[e];
    const uint32_t* cdf = cdfs + c * cdf_stride;
    const int32_t cdf_len = cdf_lengths[c];
    const int32_t max_v = cdf_len - 2;
    if (max_v < 1) return -2;
    int64_t v = static_cast<int64_t>(symbols[e]) - offsets[c];
    uint32_t raw = 0;
    bool overflow = false;
    if (v < 0) {
      raw = static_cast<uint32_t>(-2 * v - 1);
      overflow = true;
    } else if (v >= max_v) {
      raw = static_cast<uint32_t>(2 * (v - max_v));
      overflow = true;
    }
    const uint32_t s = overflow ? static_cast<uint32_t>(max_v)
                                : static_cast<uint32_t>(v);
    ops.push_back({cdf[s], cdf[s + 1] - cdf[s], false, 0, 0});
    if (overflow) {
      // little-endian 3-bit chunks with a continuation bit.
      uint32_t r = raw;
      do {
        const uint32_t chunk = r & 0x7;
        r >>= 3;
        const uint32_t more = r != 0 ? 0x8u : 0u;
        ops.push_back({0, 0, true, chunk | more, kBypassBits});
      } while (r != 0);
    }
  }

  RansEncoder enc;
  for (auto it = ops.rbegin(); it != ops.rend(); ++it) {
    if (it->is_bits) {
      enc.put_bits(it->val, it->nbits);
    } else {
      enc.put(it->start, it->freq);
    }
  }
  std::vector<uint8_t> result;
  enc.flush(&result);
  if (static_cast<int64_t>(result.size()) > out_capacity) return -1;
  std::memcpy(out, result.data(), result.size());
  return static_cast<int64_t>(result.size());
}

// Decode n symbols from `data`. Returns 0 on success.
int64_t rdvc_rans_decode(const uint8_t* data, int64_t data_len,
                         const int32_t* indexes, int64_t n,
                         const uint32_t* cdfs, int64_t cdf_stride,
                         const int32_t* cdf_lengths, const int32_t* offsets,
                         int32_t* out_symbols) {
  RansDecoder dec;
  dec.init(data, data_len);
  for (int64_t e = 0; e < n; ++e) {
    const int32_t c = indexes[e];
    const uint32_t* cdf = cdfs + c * cdf_stride;
    const int32_t cdf_len = cdf_lengths[c];
    const int32_t max_v = cdf_len - 2;
    if (max_v < 1) return -2;
    const uint32_t cum = dec.peek();
    // CDF rows are short (tens of entries): linear scan is branch-predictable
    // and beats binary search at these sizes.
    int32_t s = 0;
    while (s + 1 < cdf_len - 1 && cdf[s + 1] <= cum) ++s;
    dec.advance(cdf[s], cdf[s + 1] - cdf[s]);
    int64_t v = s;
    if (s == max_v) {
      uint32_t raw = 0;
      uint32_t shift = 0;
      while (true) {
        const uint32_t chunk = dec.get_bits(kBypassBits);
        raw |= (chunk & 0x7) << shift;
        shift += 3;
        if ((chunk & 0x8) == 0) break;
        if (shift > 62) return -3;
      }
      if (raw & 1) {
        v = -static_cast<int64_t>((raw + 1) / 2);
      } else {
        v = static_cast<int64_t>(max_v) + raw / 2;
      }
    }
    out_symbols[e] = static_cast<int32_t>(v + offsets[c]);
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Channel-aligned chunked rANS16 decoder (payload tag 0x03; see
// entropy/device_rans.py).
// 16-bit renormalization variant produced by the TPU-side encoder: per
// stream, words are [state_hi, state_lo, emitted words in decode order].
// Streams are independent -> decoded in parallel with std::thread.
// ---------------------------------------------------------------------------

#include <atomic>
#include <thread>

namespace {

struct StreamSpan {
  const uint16_t* words;
  int64_t n_words;
  int64_t base;   // first symbol index
  int64_t count;  // symbols in this stream
};

// Channel-aligned stream (payload tag 0x03): the stream codes ONE channel,
// writing symbols at out[(j*L + t) * C + c] (tensor pixel-major order).
int decode_stream16ca(const StreamSpan& sp, const uint32_t* cdf,
                      int32_t cdf_len, int32_t offset, int64_t out_start,
                      int64_t out_stride, int32_t* out) {
  if (sp.n_words < 2) return -10;
  uint32_t state = (static_cast<uint32_t>(sp.words[0]) << 16) | sp.words[1];
  int64_t pos = 2;
  for (int64_t t = 0; t < sp.count; ++t) {
    const uint32_t cum = state & 0xffffu;
    int32_t s = 0;
    while (s + 1 < cdf_len - 1 && cdf[s + 1] <= cum) ++s;
    state = (cdf[s + 1] - cdf[s]) * (state >> 16) + cum - cdf[s];
    if (state < (1u << 16)) {
      if (pos >= sp.n_words) return -11;
      state = (state << 16) | sp.words[pos++];
    }
    if (s == cdf_len - 2) return -12;  // escape: not valid in chunked streams
    out[out_start + t * out_stride] = s + offset;
  }
  return 0;
}

}  // namespace

extern "C" {

// Decode a CHANNEL-ALIGNED chunked rANS16 payload (tag 0x03; executable
// spec: decode_chunked_ca_py in entropy/device_rans.py). Stream s codes
// channel s / K (K = S / channels) over pixels [(s%K)*L, ...); output is
// written in tensor (pixel-major, channel-minor) order.
int64_t rdvc_rans16ca_decode(const uint8_t* payload, int64_t payload_len,
                             int64_t n_symbols, int32_t channels,
                             const uint32_t* cdfs, int64_t cdf_stride,
                             const int32_t* cdf_lengths,
                             const int32_t* offsets, int32_t* out,
                             int32_t num_threads) {
  if (payload_len < 11 || payload[0] != 0x03) return -20;
  uint32_t n = 0;
  std::memcpy(&n, payload + 1, 4);
  uint16_t S = 0;
  std::memcpy(&S, payload + 5, 2);
  uint32_t L32 = 0;
  std::memcpy(&L32, payload + 7, 4);
  if (static_cast<int64_t>(n) != n_symbols || S == 0 || L32 == 0) return -21;
  if (channels <= 0 || S % channels || n_symbols % channels) return -24;
  const int64_t L = L32;
  const int64_t K = S / channels;
  const int64_t hw = n_symbols / channels;
  int64_t off = 11 + 4ll * S;
  if (off > payload_len) return -22;
  std::vector<StreamSpan> spans(S);
  for (int s = 0; s < S; ++s) {
    uint32_t len = 0;
    std::memcpy(&len, payload + 11 + 4ll * s, 4);
    if (off + len > payload_len || (len & 1)) return -23;
    spans[s].words = reinterpret_cast<const uint16_t*>(payload + off);
    spans[s].n_words = len / 2;
    const int64_t j = s % K;
    spans[s].base = j * L;  // first pixel for this stream
    spans[s].count = std::max<int64_t>(
        0, std::min<int64_t>(L, hw - j * L));
    off += len;
  }

  std::atomic<int> next(0);
  std::atomic<int> status(0);
  const int nt = std::max(1, std::min<int>(num_threads, S));
  auto worker = [&]() {
    while (true) {
      const int s = next.fetch_add(1);
      if (s >= S || status.load() != 0) return;
      const int32_t c = static_cast<int32_t>(s / K);
      const int rc = decode_stream16ca(
          spans[s], cdfs + c * cdf_stride, cdf_lengths[c], offsets[c],
          spans[s].base * channels + c, channels, out);
      if (rc != 0) status.store(rc);
    }
  };
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int i = 0; i < nt; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return status.load();
}

// Decode a BIN-INDEXED chunked rANS16 payload (tag 0x05; executable spec:
// decode_bin_py in entropy/device_gaussian.py — the hyperprior y-stream).
// Stream s codes FLAT elements [s*L, (s+1)*L); each element's CDF row is
// bins[e] (derived by the caller from the coded hyper-latent, never stored
// in the payload). Escapes are invalid by construction (escaped frames use
// the host 0x01 transport).
int64_t rdvc_rans16bin_decode(const uint8_t* payload, int64_t payload_len,
                              int64_t n_symbols, const int32_t* bins,
                              int32_t n_bins, const uint32_t* cdfs,
                              int64_t cdf_stride,
                              const int32_t* cdf_lengths,
                              const int32_t* offsets, int32_t* out,
                              int32_t num_threads) {
  if (payload_len < 11 || payload[0] != 0x05) return -30;
  uint32_t n = 0;
  std::memcpy(&n, payload + 1, 4);
  uint16_t S = 0;
  std::memcpy(&S, payload + 5, 2);
  uint32_t L32 = 0;
  std::memcpy(&L32, payload + 7, 4);
  if (static_cast<int64_t>(n) != n_symbols || S == 0 || L32 == 0) return -31;
  const int64_t L = L32;
  int64_t off = 11 + 4ll * S;
  if (off > payload_len) return -32;
  std::vector<StreamSpan> spans(S);
  for (int s = 0; s < S; ++s) {
    uint32_t len = 0;
    std::memcpy(&len, payload + 11 + 4ll * s, 4);
    if (off + len > payload_len || (len & 1)) return -33;
    spans[s].words = reinterpret_cast<const uint16_t*>(payload + off);
    spans[s].n_words = len / 2;
    spans[s].base = static_cast<int64_t>(s) * L;
    spans[s].count = std::max<int64_t>(
        0, std::min<int64_t>(L, n_symbols - spans[s].base));
    off += len;
  }

  std::atomic<int> next(0);
  std::atomic<int> status(0);
  const int nt = std::max(1, std::min<int>(num_threads, S));
  auto worker = [&]() {
    while (true) {
      const int s = next.fetch_add(1);
      if (s >= S || status.load() != 0) return;
      const StreamSpan& sp = spans[s];
      if (sp.count <= 0) continue;
      if (sp.n_words < 2) {
        status.store(-34);
        return;
      }
      uint32_t state =
          (static_cast<uint32_t>(sp.words[0]) << 16) | sp.words[1];
      int64_t pos = 2;
      for (int64_t t = 0; t < sp.count; ++t) {
        const int64_t e = sp.base + t;
        const int32_t b = bins[e];
        if (b < 0 || b >= n_bins) {
          status.store(-35);
          return;
        }
        const uint32_t* cdf = cdfs + b * cdf_stride;
        const int32_t cdf_len = cdf_lengths[b];
        const uint32_t cum = state & 0xffffu;
        int32_t sym = 0;
        while (sym + 1 < cdf_len - 1 && cdf[sym + 1] <= cum) ++sym;
        state = (cdf[sym + 1] - cdf[sym]) * (state >> 16) + cum - cdf[sym];
        if (state < (1u << 16)) {
          if (pos >= sp.n_words) {
            status.store(-36);
            return;
          }
          state = (state << 16) | sp.words[pos++];
        }
        if (sym == cdf_len - 2) {
          status.store(-37);  // escape: invalid in device-coded streams
          return;
        }
        out[e] = sym + offsets[b];
      }
    }
  };
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int i = 0; i < nt; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return status.load();
}

}  // extern "C"
