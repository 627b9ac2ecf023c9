// Byte-aligned rANS primitives, format-compatible with the ryg_rans byte
// variant (public-domain, Fabian Giesen / Jarek Duda's ANS) used by the
// reference coder (reference: lib/entropy_models/rans_coder/rans_byte.h).
// The arithmetic below is dictated by that bitstream format: 32-bit state,
// renormalization lower bound 2^23, little-endian byte emission, encoder
// writes backwards / decodes forwards.
#pragma once
#include <cstdint>
#include <vector>

namespace fpc {

constexpr uint32_t kRansLow = 1u << 23;
constexpr uint32_t kPrecision = 16;
constexpr uint32_t kProbScale = 1u << kPrecision;

// Precomputed per-symbol encode parameters (Alverson reciprocal division).
struct EncSym {
  uint32_t x_max;
  uint32_t rcp;
  uint32_t bias;
  uint16_t cmpl_freq;
  uint16_t rcp_shift;

  void init(uint32_t start, uint32_t freq, uint32_t scale_bits) {
    x_max = ((kRansLow >> scale_bits) << 8) * freq;
    cmpl_freq = static_cast<uint16_t>((1u << scale_bits) - freq);
    if (freq < 2) {
      rcp = ~0u;
      rcp_shift = 0;
      bias = start + (1u << scale_bits) - 1;
    } else {
      uint32_t shift = 0;
      while (freq > (1u << shift)) ++shift;
      rcp = static_cast<uint32_t>(((1ull << (shift + 31)) + freq - 1) / freq);
      rcp_shift = static_cast<uint16_t>(shift - 1);
      bias = start;
    }
  }
};

struct DecSym {
  uint16_t start;
  uint16_t freq;
};

struct Encoder {
  uint32_t state = kRansLow;

  void reset() { state = kRansLow; }

  // ptr walks backwards; caller guarantees buffer headroom.
  inline void put(uint8_t*& ptr, uint32_t start, uint32_t freq, uint32_t scale_bits) {
    uint32_t x = state;
    const uint32_t x_max = ((kRansLow >> scale_bits) << 8) * freq;
    while (x >= x_max) {
      *--ptr = static_cast<uint8_t>(x);
      x >>= 8;
    }
    state = ((x / freq) << scale_bits) + (x % freq) + start;
  }

  inline void put_sym(uint8_t*& ptr, const EncSym& s) {
    uint32_t x = state;
    while (x >= s.x_max) {
      *--ptr = static_cast<uint8_t>(x);
      x >>= 8;
    }
    const uint32_t q =
        static_cast<uint32_t>((static_cast<uint64_t>(x) * s.rcp) >> 32) >> s.rcp_shift;
    state = x + s.bias + q * s.cmpl_freq;
  }

  inline void flush(uint8_t*& ptr) {
    ptr -= 4;
    ptr[0] = static_cast<uint8_t>(state);
    ptr[1] = static_cast<uint8_t>(state >> 8);
    ptr[2] = static_cast<uint8_t>(state >> 16);
    ptr[3] = static_cast<uint8_t>(state >> 24);
  }
};

struct Decoder {
  uint32_t state = 0;

  inline void init(const uint8_t*& ptr) {
    state = static_cast<uint32_t>(ptr[0]) | (static_cast<uint32_t>(ptr[1]) << 8) |
            (static_cast<uint32_t>(ptr[2]) << 16) | (static_cast<uint32_t>(ptr[3]) << 24);
    ptr += 4;
  }

  inline uint32_t peek(uint32_t scale_bits) const {
    return state & ((1u << scale_bits) - 1);
  }

  inline void advance(const uint8_t*& ptr, uint32_t start, uint32_t freq,
                      uint32_t scale_bits) {
    const uint32_t mask = (1u << scale_bits) - 1;
    uint32_t x = freq * (state >> scale_bits) + (state & mask) - start;
    while (x < kRansLow) {
      x = (x << 8) | *ptr++;
    }
    state = x;
  }
};

}  // namespace fpc
