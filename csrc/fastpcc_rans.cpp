// C-ABI rANS coders + CDF quantization for fastpcc_tpu (host side, ctypes).
//
// Three coder families, bitstream-compatible with the reference framework:
//  * pmf->quantized-CDF (reference: lib/entropy_models/rans_coder/cdf_ops.cpp:4-143)
//  * IndexedRansCoder / BinaryRansCoder batch coders with Exp-Golomb overflow
//    bypass (reference: lib/entropy_models/rans_coder/rans_wrapper.cpp:89-428)
//  * streaming LIFO encoder/decoder sharing one rANS state across calls
//    (reference: models/convolutional/lossy_coord_v3/rans_coder/simple_rans_wrapper.cpp)
//
// All symbol probabilities are 16-bit (PROB_SCALE = 1<<16). Batch loops are
// OpenMP-parallel. Implementation is original; the bit-level arithmetic is
// fixed by the bitstream format.
#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

#include "rans_core.h"

using fpc::kPrecision;
using fpc::kProbScale;

extern "C" {

// ---------------------------------------------------------------------------
// CDF quantization
// ---------------------------------------------------------------------------

// Quantize one pmf row to a 16-bit integer CDF. Writes the CDF into cdf_out
// (capacity pmf_size + 2) and returns its length. offset is adjusted in place
// when overflow coding trims leading zero-frequency symbols.
static int64_t quantize_one_pmf(const double* pmf_in, int64_t pmf_size, bool overflow,
                                int32_t* offset, uint32_t* cdf_out) {
  std::vector<double> cum(pmf_size);
  double total = 0.0;
  for (int64_t i = 0; i < pmf_size; ++i) {
    total += pmf_in[i];
    cum[i] = total;
  }
  const double overflow_mass = std::max(1.0 - total, 0.0);
  if (overflow) total += overflow_mass;

  int64_t n = overflow ? pmf_size + 2 : pmf_size + 1;
  cdf_out[0] = 0;
  for (int64_t i = 0; i < pmf_size; ++i) {
    cdf_out[i + 1] =
        static_cast<uint32_t>(std::round(kProbScale * (cum[i] / total)));
  }
  cdf_out[n - 1] = kProbScale;

  if (overflow) {
    // Trim zero-frequency head/tail; the trimmed head shifts the offset.
    int64_t lo = 0, hi = 0;
    for (int64_t i = 0; i < n - 1; ++i) {
      if (cdf_out[i + 1] != cdf_out[i]) { lo = i; break; }
    }
    for (int64_t i = n - 2; i > 0; --i) {
      if (cdf_out[i - 1] != cdf_out[i]) { hi = i; break; }
    }
    *offset += static_cast<int32_t>(lo);
    if (lo > hi) {  // degenerate: all mass on the escape symbol
      lo = n - 3;
      hi = lo + 1;
    }
    const int64_t new_n = hi - lo + 2;
    for (int64_t i = 0; i < new_n - 1; ++i) cdf_out[i] = cdf_out[i + lo];
    n = new_n;
    cdf_out[n - 1] = kProbScale;
  }

  // Repair zero-frequency symbols by stealing from the lowest freq > 1.
  for (int64_t i = 0; i < n - 1; ++i) {
    if (cdf_out[i + 1] != cdf_out[i]) continue;
    uint32_t best_freq = ~0u;
    int64_t best = -1;
    for (int64_t j = 0; j < n - 1; ++j) {
      const uint32_t freq = cdf_out[j + 1] - cdf_out[j];
      if (freq > 1 && freq < best_freq) { best_freq = freq; best = j; }
    }
    if (best < 0) return -1;  // cannot repair
    if (best < i) {
      for (int64_t j = best + 1; j <= i; ++j) --cdf_out[j];
    } else {
      for (int64_t j = i + 1; j <= best; ++j) ++cdf_out[j];
    }
  }
  return n;
}

// Batched version. cdfs_out is [n_pmf, pmf_size+2] row-major; cdf_sizes_out[i]
// is the valid length of row i. Returns 0 on success.
int fpc_pmf_to_quantized_cdf(const double* pmfs, int64_t n_pmf, int64_t pmf_size,
                             int overflow, int32_t* offsets, uint32_t* cdfs_out,
                             int32_t* cdf_sizes_out) {
  const int64_t stride = pmf_size + 2;
  int rc = 0;
#pragma omp parallel for
  for (int64_t i = 0; i < n_pmf; ++i) {
    const int64_t n = quantize_one_pmf(pmfs + i * pmf_size, pmf_size,
                                       overflow != 0, offsets + i,
                                       cdfs_out + i * stride);
    if (n < 0) rc = -1;
    cdf_sizes_out[i] = static_cast<int32_t>(n);
  }
  return rc;
}

// ---------------------------------------------------------------------------
// Indexed batch coder (factorized / indexed entropy models)
// ---------------------------------------------------------------------------

namespace {

struct CdfTables {
  std::vector<std::vector<fpc::EncSym>> enc;
  std::vector<std::vector<fpc::DecSym>> dec;
  std::vector<std::vector<uint32_t>> cdf;
};

void build_tables(const uint32_t* cdfs, const int32_t* cdf_sizes, int64_t n_cdfs,
                  int64_t cdf_stride, CdfTables* t) {
  t->enc.resize(n_cdfs);
  t->dec.resize(n_cdfs);
  t->cdf.resize(n_cdfs);
  for (int64_t c = 0; c < n_cdfs; ++c) {
    const uint32_t* row = cdfs + c * cdf_stride;
    const int64_t n_sym = cdf_sizes[c] - 1;
    t->enc[c].resize(n_sym);
    t->dec[c].resize(n_sym);
    t->cdf[c].assign(row, row + cdf_sizes[c]);
    for (int64_t s = 0; s < n_sym; ++s) {
      const uint32_t start = row[s];
      const uint32_t freq = row[s + 1] - row[s];
      t->enc[c][s].init(start, freq, kPrecision);
      t->dec[c][s] = {static_cast<uint16_t>(start), static_cast<uint16_t>(freq)};
    }
  }
}

// bit coders with scale_bits=1 used by the overflow bypass
const fpc::EncSym kBitEnc[2] = {[] { fpc::EncSym s; s.init(0, 1, 1); return s; }(),
                                [] { fpc::EncSym s; s.init(1, 1, 1); return s; }()};
const fpc::DecSym kBitDec[2] = {{0, 1}, {1, 1}};

}  // namespace

// Encode a [batch, n_sym] int32 symbol array. indexes may be null (then the
// cdf for position j is j % n_cdfs). Streams are written right-aligned into
// out_buf[b*unit_buf_size .. (b+1)*unit_buf_size); out_sizes[b] receives the
// byte count. Returns 0, or -1 if a unit overflowed its buffer slot.
int fpc_indexed_encode(const uint32_t* cdfs, const int32_t* cdf_sizes,
                       int64_t n_cdfs, int64_t cdf_stride, const int32_t* offsets,
                       const int32_t* symbols, const int32_t* indexes,
                       int64_t batch, int64_t n_sym, int overflow,
                       uint8_t* out_buf, int64_t unit_buf_size,
                       int64_t* out_sizes) {
  CdfTables t;
  build_tables(cdfs, cdf_sizes, n_cdfs, cdf_stride, &t);
  int rc = 0;
#pragma omp parallel for
  for (int64_t b = 0; b < batch; ++b) {
    uint8_t* const buf = out_buf + b * unit_buf_size;
    uint8_t* const lo_guard = buf + 64;  // headroom check granularity
    uint8_t* ptr = buf + unit_buf_size;
    fpc::Encoder enc;
    bool overflowed = false;
    const int32_t* sym_row = symbols + b * n_sym;
    const int32_t* idx_row = indexes ? indexes + b * n_sym : nullptr;
    for (int64_t k = n_sym - 1; k >= 0; --k) {
      if (ptr < lo_guard) { overflowed = true; break; }
      const int64_t c = idx_row ? idx_row[k] : (k % n_cdfs);
      const auto& esyms = t.enc[c];
      int32_t value = sym_row[k] - offsets[c];
      if (overflow) {
        const int32_t max_value = static_cast<int32_t>(esyms.size()) - 1;
        const bool sign = value < 0;
        int32_t gamma = 0;
        if (sign) {
          gamma = -value;
          value = max_value;
        } else if (value >= max_value) {
          gamma = value - max_value + 1;
          value = max_value;
        }
        if (value == max_value && (sign || gamma > 0)) {
          enc.put_sym(ptr, kBitEnc[sign ? 1 : 0]);
          int32_t nbits = 0;
          while (gamma != 0) {
            enc.put_sym(ptr, kBitEnc[gamma & 1]);
            gamma >>= 1;
            ++nbits;
          }
          while (--nbits > 0) enc.put_sym(ptr, kBitEnc[0]);
        }
      }
      enc.put_sym(ptr, esyms[value]);
    }
    if (overflowed || ptr - buf < 4) {
      out_sizes[b] = -1;
      rc = -1;
      continue;
    }
    enc.flush(ptr);
    out_sizes[b] = (buf + unit_buf_size) - ptr;
  }
  return rc;
}

int fpc_indexed_decode(const uint32_t* cdfs, const int32_t* cdf_sizes,
                       int64_t n_cdfs, int64_t cdf_stride, const int32_t* offsets,
                       const uint8_t* streams, const int64_t* stream_offsets,
                       const int32_t* indexes, int64_t batch, int64_t n_sym,
                       int overflow, int32_t* symbols_out) {
  CdfTables t;
  build_tables(cdfs, cdf_sizes, n_cdfs, cdf_stride, &t);
#pragma omp parallel for
  for (int64_t b = 0; b < batch; ++b) {
    const uint8_t* ptr = streams + stream_offsets[b];
    const int32_t* idx_row = indexes ? indexes + b * n_sym : nullptr;
    int32_t* out_row = symbols_out + b * n_sym;
    fpc::Decoder dec;
    dec.init(ptr);
    for (int64_t j = 0; j < n_sym; ++j) {
      const int64_t c = idx_row ? idx_row[j] : (j % n_cdfs);
      const auto& cdf = t.cdf[c];
      const auto& dsyms = t.dec[c];
      const uint32_t cf = dec.peek(kPrecision);
      int32_t value = static_cast<int32_t>(
          std::upper_bound(cdf.begin() + 1, cdf.end(), cf) - cdf.begin() - 1);
      dec.advance(ptr, dsyms[value].start, dsyms[value].freq, kPrecision);
      if (overflow) {
        const int32_t max_value = static_cast<int32_t>(dsyms.size()) - 1;
        if (value == max_value) {
          int32_t nbits = 0;
          while (dec.peek(1) == 0) {
            ++nbits;
            dec.advance(ptr, kBitDec[0].start, kBitDec[0].freq, 1);
          }
          dec.advance(ptr, kBitDec[1].start, kBitDec[1].freq, 1);
          value = 1 << nbits;
          while (--nbits >= 0) {
            const int32_t bit = static_cast<int32_t>(dec.peek(1));
            dec.advance(ptr, kBitDec[bit].start, kBitDec[bit].freq, 1);
            value |= bit << nbits;
          }
          const int32_t sign = static_cast<int32_t>(dec.peek(1));
          dec.advance(ptr, kBitDec[sign].start, kBitDec[sign].freq, 1);
          value = sign ? -value : value + max_value - 1;
        }
      }
      out_row[j] = value + offsets[c];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Binary batch coder (per-symbol 16-bit P(1))
// ---------------------------------------------------------------------------

int fpc_binary_encode(const uint8_t* symbols, const uint32_t* probs,
                      int64_t batch, int64_t n_sym, uint8_t* out_buf,
                      int64_t unit_buf_size, int64_t* out_sizes) {
  int rc = 0;
#pragma omp parallel for
  for (int64_t b = 0; b < batch; ++b) {
    uint8_t* const buf = out_buf + b * unit_buf_size;
    uint8_t* const lo_guard = buf + 16;
    uint8_t* ptr = buf + unit_buf_size;
    const uint8_t* sym_row = symbols + b * n_sym;
    const uint32_t* prob_row = probs + b * n_sym;
    fpc::Encoder enc;
    bool overflowed = false;
    for (int64_t k = n_sym - 1; k >= 0; --k) {
      if (ptr < lo_guard) { overflowed = true; break; }
      const uint32_t p1 = prob_row[k];
      if (sym_row[k] == 0) {
        enc.put(ptr, 0, kProbScale - p1, kPrecision);
      } else {
        enc.put(ptr, kProbScale - p1, p1, kPrecision);
      }
    }
    if (overflowed || ptr - buf < 4) {
      out_sizes[b] = -1;
      rc = -1;
      continue;
    }
    enc.flush(ptr);
    out_sizes[b] = (buf + unit_buf_size) - ptr;
  }
  return rc;
}

int fpc_binary_decode(const uint8_t* streams, const int64_t* stream_offsets,
                      const uint32_t* probs, int64_t batch, int64_t n_sym,
                      uint8_t* symbols_out) {
#pragma omp parallel for
  for (int64_t b = 0; b < batch; ++b) {
    const uint8_t* ptr = streams + stream_offsets[b];
    const uint32_t* prob_row = probs + b * n_sym;
    uint8_t* out_row = symbols_out + b * n_sym;
    fpc::Decoder dec;
    dec.init(ptr);
    for (int64_t j = 0; j < n_sym; ++j) {
      const uint32_t p0 = kProbScale - prob_row[j];
      if (dec.peek(kPrecision) < p0) {
        out_row[j] = 0;
        dec.advance(ptr, 0, p0, kPrecision);
      } else {
        out_row[j] = 1;
        dec.advance(ptr, p0, kProbScale - p0, kPrecision);
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Streaming LIFO coder (one shared rANS state across many encode calls)
// ---------------------------------------------------------------------------
// CDF row convention (uint16, length max_sym): start(sym) = sym ? row[sym-1] : 0,
// end(sym) = sym == max_sym-1 ? 65536 : row[sym]. Decoder picks the symbol by
// upper_bound(row, cf) clamped to max_sym-1.

struct FpcStreamEncoder {
  std::vector<uint8_t> buf;
  uint8_t* ptr;
  fpc::Encoder enc;

  explicit FpcStreamEncoder(int64_t size) : buf(size) { ptr = buf.data() + buf.size(); }

  void ensure(int64_t need) {
    const int64_t used = (buf.data() + buf.size()) - ptr;
    if (static_cast<int64_t>(buf.size()) - used >= need) return;
    std::vector<uint8_t> bigger(std::max<int64_t>(buf.size() * 2, used + need + 64));
    uint8_t* new_end = bigger.data() + bigger.size();
    std::memcpy(new_end - used, ptr, used);
    buf.swap(bigger);
    ptr = buf.data() + buf.size() - used;
  }
};

void* fpc_enc_new(int64_t buf_size) { return new FpcStreamEncoder(buf_size); }
void fpc_enc_free(void* h) { delete static_cast<FpcStreamEncoder*>(h); }

// Current stream size in bytes (pre-flush, excludes the 4 state bytes).
int64_t fpc_enc_size(void* h) {
  auto* e = static_cast<FpcStreamEncoder*>(h);
  return (e->buf.data() + e->buf.size()) - e->ptr;
}

// Encode n_sym uint16 symbols LIFO. cdf_rows is [n_cdfs, max_sym] uint16;
// row used for symbol k is k when n_cdfs == n_sym, else row 0 (n_cdfs == 1).
// Returns current stream size in bytes (excluding the 4 flush bytes).
int64_t fpc_enc_put(void* h, const uint16_t* cdf_rows, int64_t n_cdfs,
                    int64_t max_sym, const uint16_t* symbols, int64_t n_sym) {
  auto* e = static_cast<FpcStreamEncoder*>(h);
  e->ensure(4 * n_sym + 16);
  for (int64_t k = n_sym - 1; k >= 0; --k) {
    const uint16_t* row = cdf_rows + (n_cdfs == 1 ? 0 : k) * max_sym;
    const uint16_t sym = symbols[k];
    const uint32_t start = sym == 0 ? 0 : row[sym - 1];
    const uint32_t end = sym == max_sym - 1 ? kProbScale : row[sym];
    e->enc.put(e->ptr, start, end - start, kPrecision);
  }
  return (e->buf.data() + e->buf.size()) - e->ptr;
}

// Raw variant: per-symbol (start, freq-1) pairs already gathered from the CDF
// rows (device-side), avoiding the full-CDF transfer on the encode path.
// Bitstream-identical to fpc_enc_put with the same underlying CDFs.
int64_t fpc_enc_put_raw(void* h, const uint16_t* starts,
                        const uint16_t* freqs_minus_1, int64_t n_sym) {
  auto* e = static_cast<FpcStreamEncoder*>(h);
  e->ensure(4 * n_sym + 16);
  for (int64_t k = n_sym - 1; k >= 0; --k) {
    e->enc.put(e->ptr, starts[k],
               static_cast<uint32_t>(freqs_minus_1[k]) + 1, kPrecision);
  }
  return (e->buf.data() + e->buf.size()) - e->ptr;
}

// Binary variant: rows are single thresholds c = P(0)*65536.
int64_t fpc_enc_put_bin(void* h, const uint16_t* thresholds, int64_t n_cdfs,
                        const uint8_t* symbols, int64_t n_sym) {
  auto* e = static_cast<FpcStreamEncoder*>(h);
  e->ensure(2 * n_sym + 16);
  for (int64_t k = n_sym - 1; k >= 0; --k) {
    const uint32_t c = thresholds[n_cdfs == 1 ? 0 : k];
    const uint32_t start = symbols[k] ? c : 0;
    const uint32_t end = symbols[k] ? kProbScale : c;
    e->enc.put(e->ptr, start, end - start, kPrecision);
  }
  return (e->buf.data() + e->buf.size()) - e->ptr;
}

// Flush the state. If out != null, copies the stream (returns size); the
// encoder resets for reuse either way. Call once with out=null to query size,
// then again is NOT supported — query via return value of a single call:
// pass a buffer of at least fpc_enc_put(...)+4 bytes.
int64_t fpc_enc_flush(void* h, uint8_t* out) {
  auto* e = static_cast<FpcStreamEncoder*>(h);
  e->enc.flush(e->ptr);
  const int64_t size = (e->buf.data() + e->buf.size()) - e->ptr;
  if (out) std::memcpy(out, e->ptr, size);
  e->ptr = e->buf.data() + e->buf.size();
  e->enc.reset();
  return size;
}

struct FpcStreamDecoder {
  std::vector<uint8_t> buf;
  const uint8_t* ptr = nullptr;
  fpc::Decoder dec;
};

void* fpc_dec_new() { return new FpcStreamDecoder(); }
void fpc_dec_free(void* h) { delete static_cast<FpcStreamDecoder*>(h); }

int fpc_dec_init(void* h, const uint8_t* data, int64_t size) {
  auto* d = static_cast<FpcStreamDecoder*>(h);
  d->buf.assign(data, data + size);
  d->ptr = d->buf.data();
  d->dec.init(d->ptr);
  return 0;
}

int fpc_dec_get(void* h, const uint16_t* cdf_rows, int64_t n_cdfs,
                int64_t max_sym, uint16_t* symbols_out, int64_t n_sym) {
  auto* d = static_cast<FpcStreamDecoder*>(h);
  for (int64_t j = 0; j < n_sym; ++j) {
    const uint16_t* row = cdf_rows + (n_cdfs == 1 ? 0 : j) * max_sym;
    const uint32_t cf = d->dec.peek(kPrecision);
    int64_t sym = std::upper_bound(row, row + max_sym, cf) - row;
    if (sym > max_sym - 1) sym = max_sym - 1;
    const uint32_t start = sym == 0 ? 0 : row[sym - 1];
    const uint32_t end = sym == max_sym - 1 ? kProbScale : row[sym];
    d->dec.advance(d->ptr, start, end - start, kPrecision);
    symbols_out[j] = static_cast<uint16_t>(sym);
  }
  return 0;
}

int fpc_dec_get_bin(void* h, const uint16_t* thresholds, int64_t n_cdfs,
                    uint8_t* symbols_out, int64_t n_sym) {
  auto* d = static_cast<FpcStreamDecoder*>(h);
  for (int64_t j = 0; j < n_sym; ++j) {
    const uint32_t c = thresholds[n_cdfs == 1 ? 0 : j];
    const uint32_t cf = d->dec.peek(kPrecision);
    const bool sym = cf >= c;
    const uint32_t start = sym ? c : 0;
    const uint32_t end = sym ? kProbScale : c;
    d->dec.advance(d->ptr, start, end - start, kPrecision);
    symbols_out[j] = sym ? 1 : 0;
  }
  return 0;
}

}  // extern "C"
