// Native wire→planar repacker for GGUF block formats.
//
// The TPU-native runtime keeps quantized tensors as structure-of-arrays
// planes (see ggmlsharp_tpu/quant/formats.py); GGUF files store interleaved
// ggml wire blocks. Repacking a 7B model touches ~4 GB, so the hot loop is
// native C++ with a row-parallel thread pool (the Python/numpy fallback in
// io/gguf.py stays as the portable path). Exposed as a plain C ABI for
// ctypes (no pybind11 in this image).
//
// Layout contract (must match quant/formats.py):
//   * storage order: element c*bs + l  →  position l*C + c  (C = k/bs)
//   * planar nibbles: bits [4j, 4j+4) of word w = storage elem j*(k/8) + w
//   * planar 2-bit:   bits [2j, 2j+2) of word w = storage elem j*(k/16) + w
//   * f16 pair planes: word w = (f16[w], f16[w + C/2]) as (lo, hi)
//
// Wire layouts follow llama.cpp ggml-common.h (see io/gguf.py docstring).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

// scratch: one row of unpacked values in element order, then emit planes
struct RowScratch {
  std::vector<int32_t> vals;  // element order
  std::vector<int32_t> storage;  // storage order
};

inline void to_storage(const int32_t* vals, int32_t* storage, int k, int bs) {
  const int C = k / bs;
  for (int c = 0; c < C; ++c)
    for (int l = 0; l < bs; ++l)
      storage[l * C + c] = vals[c * bs + l];
}

inline void pack4_planar(const int32_t* storage, uint32_t* out, int k) {
  const int W = k / 8;
  for (int w = 0; w < W; ++w) {
    uint32_t acc = 0;
    for (int j = 0; j < 8; ++j)
      acc |= (uint32_t)(storage[j * W + w] & 0xF) << (4 * j);
    out[w] = acc;
  }
}

inline void pack2_planar(const int32_t* storage, uint32_t* out, int k) {
  const int W = k / 16;
  for (int w = 0; w < W; ++w) {
    uint32_t acc = 0;
    for (int j = 0; j < 16; ++j)
      acc |= (uint32_t)(storage[j * W + w] & 0x3) << (2 * j);
    out[w] = acc;
  }
}

inline void pack_f16_pairs(const uint16_t* d, uint32_t* out, int C) {
  const int H = C / 2;
  for (int w = 0; w < H; ++w)
    out[w] = (uint32_t)d[w] | ((uint32_t)d[w + H] << 16);
}

inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t expman = h & 0x7FFF;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  float out;
  if (exp == 0) {
    out = (float)man * 5.9604644775390625e-8f;
    if (sign) out = -out;
    return out;
  }
  uint32_t bits = sign | ((expman << 13) + (112u << 23));
  std::memcpy(&out, &bits, 4);
  return out;
}

inline uint16_t float_to_half(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, 4);
  uint32_t sign = (bits >> 16) & 0x8000;
  int32_t exp = (int32_t)((bits >> 23) & 0xFF) - 127 + 15;
  uint32_t man = bits & 0x7FFFFF;
  if (exp <= 0) {
    if (exp < -10) return (uint16_t)sign;
    man |= 0x800000;
    uint32_t shift = 14 - exp;
    uint32_t half_man = man >> shift;
    // round to nearest even
    uint32_t rem = man & ((1u << shift) - 1);
    uint32_t halfway = 1u << (shift - 1);
    if (rem > halfway || (rem == halfway && (half_man & 1))) half_man++;
    return (uint16_t)(sign | half_man);
  }
  if (exp >= 31) return (uint16_t)(sign | 0x7C00);
  uint32_t half = sign | ((uint32_t)exp << 10) | (man >> 13);
  uint32_t rem = man & 0x1FFF;
  if (rem > 0x1000 || (rem == 0x1000 && (half & 1))) half++;
  return (uint16_t)half;
}

template <typename Fn>
void parallel_rows(int rows, Fn fn) {
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min<unsigned>(nt, (unsigned)rows);
  if (nt <= 1) {
    for (int r = 0; r < rows; ++r) fn(r);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(nt);
  for (unsigned t = 0; t < nt; ++t) {
    ts.emplace_back([=]() {
      for (int r = (int)t; r < rows; r += (int)nt) fn(r);
    });
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Q8_0 wire {f16 d; i8 qs[32]} → qs int8 storage order + d f16 + d_p u32
void repack_q8_0(const uint8_t* wire, int rows, int k,
                 int8_t* qs_out, uint16_t* d_out, uint32_t* dp_out) {
  const int nb = k / 32, bb = 34, C = nb;
  parallel_rows(rows, [=](int r) {
    const uint8_t* src = wire + (size_t)r * nb * bb;
    int8_t* qs = qs_out + (size_t)r * k;
    uint16_t* d = d_out + (size_t)r * nb;
    for (int b = 0; b < nb; ++b) {
      const uint8_t* blk = src + b * bb;
      std::memcpy(&d[b], blk, 2);
      const int8_t* q = (const int8_t*)(blk + 2);
      for (int l = 0; l < 32; ++l) qs[l * C + b] = q[l];  // storage order
    }
    if (dp_out && (C % 2) == 0)
      pack_f16_pairs(d, dp_out + (size_t)r * (C / 2), C);
  });
}

// Q4_0 wire {f16 d; u8 qs[16]} (split-half nibbles) → planar storage qs
void repack_q4_0(const uint8_t* wire, int rows, int k,
                 uint32_t* qs_out, uint16_t* d_out, uint32_t* dp_out) {
  const int nb = k / 32, bb = 18, C = nb;
  parallel_rows(rows, [=](int r) {
    std::vector<int32_t> vals(k), storage(k);
    const uint8_t* src = wire + (size_t)r * nb * bb;
    uint16_t* d = d_out + (size_t)r * nb;
    for (int b = 0; b < nb; ++b) {
      const uint8_t* blk = src + b * bb;
      std::memcpy(&d[b], blk, 2);
      const uint8_t* q = blk + 2;
      for (int j = 0; j < 16; ++j) {
        vals[b * 32 + j] = q[j] & 0xF;
        vals[b * 32 + 16 + j] = q[j] >> 4;
      }
    }
    to_storage(vals.data(), storage.data(), k, 32);
    pack4_planar(storage.data(), qs_out + (size_t)r * (k / 8), k);
    if (dp_out && (C % 2) == 0)
      pack_f16_pairs(d, dp_out + (size_t)r * (C / 2), C);
  });
}

// Q4_K wire {f16 d, dmin; u8 scales[12]; u8 qs[128]} → planar + fused scales
void repack_q4_k(const uint8_t* wire, int rows, int k,
                 uint32_t* qs_out, uint16_t* d_out, uint16_t* dmin_out,
                 uint8_t* sc_out, uint8_t* m_out,
                 uint16_t* kd_out, uint16_t* km_out,
                 uint32_t* kdp_out, uint32_t* kmp_out) {
  const int nsb = k / 256, bb = 144, C = k / 32;
  parallel_rows(rows, [=](int r) {
    std::vector<int32_t> vals(k), storage(k);
    const uint8_t* src = wire + (size_t)r * nsb * bb;
    uint16_t* d = d_out + (size_t)r * nsb;
    uint16_t* dmin = dmin_out + (size_t)r * nsb;
    uint8_t* sc = sc_out + (size_t)r * nsb * 8;
    uint8_t* m = m_out + (size_t)r * nsb * 8;
    uint16_t* kd = kd_out + (size_t)r * C;
    uint16_t* km = km_out + (size_t)r * C;
    for (int s = 0; s < nsb; ++s) {
      const uint8_t* blk = src + s * bb;
      std::memcpy(&d[s], blk, 2);
      std::memcpy(&dmin[s], blk + 2, 2);
      const uint8_t* scales = blk + 4;
      for (int j = 0; j < 8; ++j) {
        uint8_t scv, mv;
        if (j < 4) {
          scv = scales[j] & 63;
          mv = scales[j + 4] & 63;
        } else {
          scv = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4);
          mv = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4);
        }
        sc[s * 8 + j] = scv;
        m[s * 8 + j] = mv;
        kd[s * 8 + j] = float_to_half(half_to_float(d[s]) * (float)scv);
        km[s * 8 + j] = float_to_half(half_to_float(dmin[s]) * (float)mv);
      }
      const uint8_t* qs = blk + 16;
      for (int g = 0; g < 4; ++g)  // 4 groups of 64 elems / 32 bytes
        for (int j = 0; j < 32; ++j) {
          vals[s * 256 + g * 64 + j] = qs[g * 32 + j] & 0xF;
          vals[s * 256 + g * 64 + 32 + j] = qs[g * 32 + j] >> 4;
        }
    }
    to_storage(vals.data(), storage.data(), k, 32);
    pack4_planar(storage.data(), qs_out + (size_t)r * (k / 8), k);
    if (kdp_out && (C % 2) == 0) {
      pack_f16_pairs(kd, kdp_out + (size_t)r * (C / 2), C);
      pack_f16_pairs(km, kmp_out + (size_t)r * (C / 2), C);
    }
  });
}

// Q6_K wire {u8 ql[128]; u8 qh[64]; i8 scales[16]; f16 d}
void repack_q6_k(const uint8_t* wire, int rows, int k,
                 uint32_t* ql_out, uint32_t* qh_out,
                 uint16_t* d_out, int8_t* sc_out,
                 uint16_t* kd_out, uint32_t* kdp_out) {
  const int nsb = k / 256, bb = 210, C = k / 16;
  parallel_rows(rows, [=](int r) {
    std::vector<int32_t> vals(k), storage(k);
    const uint8_t* src = wire + (size_t)r * nsb * bb;
    uint16_t* d = d_out + (size_t)r * nsb;
    int8_t* sc = sc_out + (size_t)r * nsb * 16;
    uint16_t* kd = kd_out + (size_t)r * C;
    for (int s = 0; s < nsb; ++s) {
      const uint8_t* blk = src + s * bb;
      const uint8_t* ql = blk;
      const uint8_t* qh = blk + 128;
      const int8_t* scales = (const int8_t*)(blk + 192);
      std::memcpy(&d[s], blk + 208, 2);
      for (int j = 0; j < 16; ++j) {
        sc[s * 16 + j] = scales[j];
        kd[s * 16 + j] =
            float_to_half(half_to_float(d[s]) * (float)scales[j]);
      }
      for (int half = 0; half < 2; ++half) {
        const uint8_t* qlh = ql + half * 64;
        const uint8_t* qhh = qh + half * 32;
        int base = s * 256 + half * 128;
        for (int l = 0; l < 32; ++l) {
          vals[base + l] = (qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4);
          vals[base + l + 32] = (qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4);
          vals[base + l + 64] = (qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4);
          vals[base + l + 96] = (qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4);
        }
      }
    }
    to_storage(vals.data(), storage.data(), k, 16);
    pack4_planar(storage.data(), ql_out + (size_t)r * (k / 8), k);
    // qh plane: top 2 bits of storage-ordered values
    std::vector<int32_t> hi(k);
    for (int i = 0; i < k; ++i) hi[i] = storage[i] >> 4;
    pack2_planar(hi.data(), qh_out + (size_t)r * (k / 16), k);
    // ql plane wants low nibbles only
    // (pack4_planar above packed full values &0xF internally)
    if (kdp_out && (C % 2) == 0)
      pack_f16_pairs(kd, kdp_out + (size_t)r * (C / 2), C);
  });
}

int repack_abi_version() { return 1; }

}  // extern "C"
