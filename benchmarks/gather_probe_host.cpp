// gather_probe_host.cpp — measure the r4-verdict question (item 1a):
// does AVX-512 change the HOST entropy probe chain's throughput bound,
// i.e. can 512-bit gathers beat the K-way interleaved scalar chains that
// `reg_run<K>` in native/src/jdt_entropy.cpp uses?
//
// The synthetic chain mirrors reg_step's pair-LUT fast arm exactly in
// dependency structure (the part that bounds the real decoder):
//
//     w   = bswap64(load64(buf + bp/8)) << (bp & 7)   // window build
//     en  = lut[w >> (64-12)]                          // 32 KB LUT probe
//     bp += consumed(en)                               // serial dep
//     acc ^= en                                        // consume
//
// Each symbol's LUT index depends on the previous symbol's consumed-bit
// count — the chain is latency-bound, like real Huffman decode. Variants:
//
//   scalar K=1/2/4/8  — K independent streams round-robined in one loop,
//                       the production design (reg_run<4>); chains overlap
//                       in the OOO window, loads dual-issue on 2 ports.
//   simd8 / simd16    — 8 (one zmm) / 16 (two zmm, extra ILP) lanes:
//                       vpgatherqq window load + vpshufb bswap + vpsllvq
//                       + vpgatherqq LUT probe, all lanes advance together.
//                       16 lanes = the "2 pair-windows per cycle" shape.
//
// The SIMD variants are given a BEST-CASE setup the real decoder can't
// have: one shared LUT for all lanes (production streams probe per-
// component tables) and no divergence (production lanes hit 6 decode arm
// kinds; SIMD would pay masked re-execution for each). If SIMD loses even
// this idealized race, 512-bit gathers cannot help the real loop.
//
// Build + run (results recorded in docs/PERF.md, round 5):
//   g++ -O3 -march=native -o /tmp/gather_probe \
//       benchmarks/gather_probe_host.cpp && /tmp/gather_probe
#include <immintrin.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

static constexpr int LUT_BITS = 12;
static constexpr int64_t LUT_N = 1ll << LUT_BITS;
static constexpr int64_t BUF = 1ll << 23;  // 8 MB shared bitstream
static constexpr int64_t BIT_LIMIT = (BUF - 64) * 8;
static constexpr int64_t SYMBOLS = 1ll << 26;  // 67M symbols per variant

using clk = std::chrono::steady_clock;

static double secs(clk::time_point a, clk::time_point b) {
  return std::chrono::duration<double>(b - a).count();
}

// K independent streams, round-robined — the production shape.
template <int K>
static double scalar_run(const uint8_t* buf, const uint64_t* lut,
                         uint64_t* sink) {
  int64_t bp[K];
  uint64_t acc = 0;
  for (int k = 0; k < K; k++) bp[k] = (int64_t)(k * 7919) * 8 + k;
  auto t0 = clk::now();
  for (int64_t i = 0; i < SYMBOLS; i += K) {
    for (int k = 0; k < K; k++) {
      uint64_t w;
      std::memcpy(&w, buf + (bp[k] >> 3), 8);
      w = __builtin_bswap64(w) << (bp[k] & 7);
      uint64_t en = lut[w >> (64 - LUT_BITS)];
      bp[k] += (en >> 46) & 63;
      acc ^= en;
      if (bp[k] >= BIT_LIMIT) bp[k] &= 8191;  // wrap (same in all variants)
    }
  }
  auto t1 = clk::now();
  *sink ^= acc;
  return SYMBOLS / secs(t0, t1) / 1e6;
}

#if defined(__AVX512F__) && defined(__AVX512BW__)
// Per-64-bit-lane byte reverse for vpshufb.
static inline __m512i bswap64x8(__m512i v) {
  const __m512i shuf = _mm512_set_epi8(
      56, 57, 58, 59, 60, 61, 62, 63, 48, 49, 50, 51, 52, 53, 54, 55,
      40, 41, 42, 43, 44, 45, 46, 47, 32, 33, 34, 35, 36, 37, 38, 39,
      24, 25, 26, 27, 28, 29, 30, 31, 16, 17, 18, 19, 20, 21, 22, 23,
      8, 9, 10, 11, 12, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6, 7);
  return _mm512_shuffle_epi8(v, shuf);
}

// One SIMD step for 8 lanes held in (bp, acc).
static inline void simd_step(__m512i& bp, __m512i& acc, const uint8_t* buf,
                             const uint64_t* lut) {
  const __m512i seven = _mm512_set1_epi64(7);
  const __m512i c63 = _mm512_set1_epi64(63);
  __m512i off = _mm512_srli_epi64(bp, 3);
  __m512i w = _mm512_i64gather_epi64(off, buf, 1);
  w = bswap64x8(w);
  w = _mm512_sllv_epi64(w, _mm512_and_epi64(bp, seven));
  __m512i idx = _mm512_srli_epi64(w, 64 - LUT_BITS);
  __m512i en = _mm512_i64gather_epi64(idx, lut, 8);
  bp = _mm512_add_epi64(bp, _mm512_and_epi64(_mm512_srli_epi64(en, 46), c63));
  acc = _mm512_xor_si512(acc, en);
  __mmask8 m =
      _mm512_cmpge_epu64_mask(bp, _mm512_set1_epi64(BIT_LIMIT));
  bp = _mm512_mask_and_epi64(bp, m, bp, _mm512_set1_epi64(8191));
}

static __m512i lane_starts(int base) {
  alignas(64) int64_t s[8];
  for (int k = 0; k < 8; k++) s[k] = (int64_t)((base + k) * 7919) * 8 + k;
  return _mm512_load_si512(s);
}

static uint64_t reduce_xor(__m512i v) {
  alignas(64) uint64_t a[8];
  _mm512_store_si512(a, v);
  uint64_t r = 0;
  for (int k = 0; k < 8; k++) r ^= a[k];
  return r;
}

static double simd8_run(const uint8_t* buf, const uint64_t* lut,
                        uint64_t* sink) {
  __m512i bp = lane_starts(0), acc = _mm512_setzero_si512();
  auto t0 = clk::now();
  for (int64_t i = 0; i < SYMBOLS; i += 8) simd_step(bp, acc, buf, lut);
  auto t1 = clk::now();
  *sink ^= reduce_xor(acc);
  return SYMBOLS / secs(t0, t1) / 1e6;
}

static double simd16_run(const uint8_t* buf, const uint64_t* lut,
                         uint64_t* sink) {
  __m512i bp0 = lane_starts(0), bp1 = lane_starts(8);
  __m512i a0 = _mm512_setzero_si512(), a1 = _mm512_setzero_si512();
  auto t0 = clk::now();
  for (int64_t i = 0; i < SYMBOLS; i += 16) {
    simd_step(bp0, a0, buf, lut);
    simd_step(bp1, a1, buf, lut);
  }
  auto t1 = clk::now();
  *sink ^= reduce_xor(a0) ^ reduce_xor(a1);
  return SYMBOLS / secs(t0, t1) / 1e6;
}
#endif

int main() {
  std::vector<uint8_t> buf(BUF);
  std::vector<uint64_t> lut(LUT_N);
  std::mt19937_64 rng(20260820);
  for (auto& b : buf) b = (uint8_t)rng();
  // Entry: consumed-bits in [2,12] (mean ~7, like real value-resolved pair
  // entries), derived from the index so the chain stays data-dependent.
  for (int64_t i = 0; i < LUT_N; i++) {
    uint64_t c = 2 + (i * 2654435761u >> 8) % 11;
    lut[i] = (c << 46) | (i * 0x9E3779B97F4A7C15ull & 0x3FFFFFFFFFFFull);
  }
  uint64_t sink = 0;
  printf("chain probe, %lld symbols/variant, Msym/s (3 reps, best)\n",
         (long long)SYMBOLS);
  auto best = [&](auto fn, const char* name) {
    double b = 0;
    for (int r = 0; r < 3; r++) {
      double v = fn();
      if (v > b) b = v;
    }
    printf("  %-10s %8.1f Msym/s\n", name, b);
    return b;
  };
  double k1 = best([&] { return scalar_run<1>(buf.data(), lut.data(), &sink); },
                   "scalar K=1");
  best([&] { return scalar_run<2>(buf.data(), lut.data(), &sink); },
       "scalar K=2");
  double k4 = best([&] { return scalar_run<4>(buf.data(), lut.data(), &sink); },
                   "scalar K=4");
  best([&] { return scalar_run<8>(buf.data(), lut.data(), &sink); },
       "scalar K=8");
#if defined(__AVX512F__) && defined(__AVX512BW__)
  double s8 = best([&] { return simd8_run(buf.data(), lut.data(), &sink); },
                   "simd8");
  double s16 = best([&] { return simd16_run(buf.data(), lut.data(), &sink); },
                    "simd16");
  printf("ratios: K=4/K=1 %.2fx, simd8/K=4 %.2fx, simd16/K=4 %.2fx\n",
         k4 / k1, s8 / k4, s16 / k4);
#else
  printf("AVX-512 not available on this host\n");
#endif
  printf("(sink %016llx)\n", (unsigned long long)sink);
  return 0;
}
