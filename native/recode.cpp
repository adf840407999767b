// Native host-side preprocessing for zerocaf-tpu.
//
// The reference's performance layer is its Rust u64 backend
// (/root/reference/src/backend/u64/); in this framework the device compute
// path is XLA/Pallas, and the native layer covers the *host-side* work that
// feeds it: scalar recodings (bits / NAF / windowed NAF,
// reference scalar.rs:352-442) and byte<->limb codecs, which would otherwise
// be Python big-int loops.  Exposed with C linkage and loaded via ctypes
// (zerocaf_tpu/native.py); every function has a pure-Python fallback and a
// differential test against the oracle.
//
// Scalars are 256-bit little-endian byte strings operated on as 4x uint64.

#include <cstdint>
#include <cstring>

namespace {

struct U256 {
  uint64_t w[4];

  bool is_zero() const { return (w[0] | w[1] | w[2] | w[3]) == 0; }
  unsigned low_bits(unsigned k) const {
    return static_cast<unsigned>(w[0] & ((1u << k) - 1u));
  }
  void shr1() {
    w[0] = (w[0] >> 1) | (w[1] << 63);
    w[1] = (w[1] >> 1) | (w[2] << 63);
    w[2] = (w[2] >> 1) | (w[3] << 63);
    w[3] >>= 1;
  }
  void sub_small(uint64_t v) {  // self -= v (v fits u64; self >= v)
    uint64_t prev = w[0];
    w[0] -= v;
    if (w[0] > prev) {  // borrow
      for (int i = 1; i < 4; ++i) {
        if (w[i]-- != 0) break;
      }
    }
  }
  void add_small(uint64_t v) {
    uint64_t prev = w[0];
    w[0] += v;
    if (w[0] < prev) {
      for (int i = 1; i < 4; ++i) {
        if (++w[i] != 0) break;
      }
    }
  }
};

U256 load_le(const uint8_t* b) {
  U256 x;
  std::memcpy(x.w, b, 32);  // little-endian host assumed (x86/ARM LE)
  return x;
}

}  // namespace

extern "C" {

// LSB-first bit expansion: out[n][nbits] in {0,1}.
void zerocaf_bits(const uint8_t* scalars, int n, int nbits, int8_t* out) {
  for (int i = 0; i < n; ++i) {
    const uint8_t* s = scalars + 32 * i;
    int8_t* o = out + static_cast<long>(nbits) * i;
    for (int j = 0; j < nbits; ++j) {
      o[j] = (s[j >> 3] >> (j & 7)) & 1;
    }
  }
}

// Non-adjacent form (reference scalar.rs:370-389), LSB-first digits in
// {-1, 0, 1}; out[n][nbits].
void zerocaf_naf(const uint8_t* scalars, int n, int nbits, int8_t* out) {
  for (int i = 0; i < n; ++i) {
    U256 k = load_le(scalars + 32 * i);
    int8_t* o = out + static_cast<long>(nbits) * i;
    std::memset(o, 0, nbits);
    int j = 0;
    while (!k.is_zero() && j < nbits) {
      if (k.w[0] & 1) {
        int ki = 2 - static_cast<int>(k.low_bits(2));  // 1 or -1
        o[j] = static_cast<int8_t>(ki);
        if (ki > 0) k.sub_small(static_cast<uint64_t>(ki));
        else k.add_small(static_cast<uint64_t>(-ki));
      }
      k.shr1();
      ++j;
    }
  }
}

// Windowed NAF (reference scalar.rs:391-415): odd digits |d| < 2^(w-1).
void zerocaf_wnaf(const uint8_t* scalars, int n, int width, int nbits,
                  int8_t* out) {
  const int half = 1 << (width - 1);
  const int full = 1 << width;
  for (int i = 0; i < n; ++i) {
    U256 k = load_le(scalars + 32 * i);
    int8_t* o = out + static_cast<long>(nbits) * i;
    std::memset(o, 0, nbits);
    int j = 0;
    while (!k.is_zero() && j < nbits) {
      if (k.w[0] & 1) {
        int ki = static_cast<int>(k.low_bits(static_cast<unsigned>(width)));
        if (ki >= half) ki -= full;
        o[j] = static_cast<int8_t>(ki);
        if (ki > 0) k.sub_small(static_cast<uint64_t>(ki));
        else k.add_small(static_cast<uint64_t>(-ki));
      }
      k.shr1();
      ++j;
    }
  }
}

// Unsigned fixed windows (Pippenger digits): out[n][nwin] int32,
// digit j = bits [j*c, (j+1)*c).
void zerocaf_windows(const uint8_t* scalars, int n, int c, int nwin,
                     int32_t* out) {
  for (int i = 0; i < n; ++i) {
    const uint8_t* s = scalars + 32 * i;
    int32_t* o = out + static_cast<long>(nwin) * i;
    for (int w = 0; w < nwin; ++w) {
      int32_t d = 0;
      for (int b = 0; b < c; ++b) {
        int bit = w * c + b;
        if (bit < 256) d |= ((s[bit >> 3] >> (bit & 7)) & 1) << b;
      }
      o[w] = d;
    }
  }
}

// 32 LE bytes -> 22 x 12-bit limbs (int32); raw 256-bit value, no reduction.
void zerocaf_bytes_to_limbs(const uint8_t* bytes, int n, int32_t* out) {
  for (int i = 0; i < n; ++i) {
    const uint8_t* s = bytes + 32 * i;
    int32_t* o = out + 22L * i;
    for (int l = 0; l < 22; ++l) {
      int32_t v = 0;
      for (int b = 0; b < 12; ++b) {
        int bit = l * 12 + b;
        if (bit < 256) v |= ((s[bit >> 3] >> (bit & 7)) & 1) << b;
      }
      o[l] = v;
    }
  }
}

// 22 canonical limbs -> 32 LE bytes.
void zerocaf_limbs_to_bytes(const int32_t* limbs, int n, uint8_t* out) {
  for (int i = 0; i < n; ++i) {
    const int32_t* l = limbs + 22L * i;
    uint8_t* o = out + 32L * i;
    std::memset(o, 0, 32);
    for (int j = 0; j < 22; ++j) {
      for (int b = 0; b < 12; ++b) {
        int bit = j * 12 + b;
        if (bit < 256 && ((l[j] >> b) & 1)) o[bit >> 3] |= 1u << (bit & 7);
      }
    }
  }
}

int zerocaf_native_abi_version() { return 1; }

}  // extern "C"
