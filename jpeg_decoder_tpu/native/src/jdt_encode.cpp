// jdt_encode.cpp — native Huffman entropy packing for the encoder.
//
// Packs zigzag-order quantized coefficient blocks (produced by the device
// FDCT stage, ops/fdct.py) into a JPEG entropy-coded segment: DC-predicted
// run/size symbols + extend bits, byte stuffing, restart markers every ri
// MCUs — the serialization the reference intends but never ships working
// (its encode-side tables are dead/buggy: /root/reference/src/
// huff_table.c:69-163, quant_table.c:36-89; spec F.1.2 is the model).
//
// Restart segments are packed CONCURRENTLY (independent by construction —
// DC predictors reset at every RSTn), then stitched with the RSTn markers;
// segment-parallel encode mirrors the decoder's segment-parallel seam.
//
// C ABI only (ctypes); buffers are malloc'd here and released with
// jdt_free.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__AVX2__)
#include <immintrin.h>
#endif

namespace {

struct EncTable {
  const uint16_t* code;  // [256]
  const uint8_t* size;   // [256]
};

// Cursor-addressed bit packer. The original wrote one byte per
// vector::push_back (a size check, a potential realloc dispatch, and a
// store per OUTPUT byte — ~6 M push_backs per 4K image, measured as the
// encode pack's dominant cost). This form drains the accumulator 32 bits
// at a time through a raw cursor: a SWAR test finds the no-0xFF common
// case (likely: stuffing density is ~1/256 per byte) and stores all four
// bytes with one bswap store; only chunks containing an 0xFF fall back to
// the byte loop. Callers guarantee capacity via ensure() once per data
// unit. Bit order and stuffing are IDENTICAL to the push_back form
// (differential-tested byte-for-byte against core/entropy_encode).
struct BitPacker {
  std::vector<uint8_t> out;
  size_t w = 0;  // write cursor; out.size() is capacity
  uint64_t acc = 0;
  int nbits = 0;  // pending bits in acc (< 32 between put() calls)

  // Guarantee `need` writable bytes at the cursor (amortized growth).
  inline void ensure(size_t need) {
    if (out.size() - w < need)
      out.resize(std::max(out.size() * 2, w + need + 4096));
  }

  inline void drain_byte_loop() {
    uint8_t* b = out.data();
    while (nbits >= 8) {
      nbits -= 8;
      uint8_t v = static_cast<uint8_t>(acc >> nbits);
      b[w++] = v;
      if (v == 0xFF) b[w++] = 0x00;  // stuffing (spec B.1.1.5)
    }
    acc &= (1ull << nbits) - 1;
  }

  // n <= 31 (one Huffman code <= 16 bits + one EXTEND field <= 15 bits).
  inline void put(uint32_t value, int n) {
    acc = (acc << n) | (value & ((1ull << n) - 1));
    nbits += n;
    if (nbits < 32) return;
    nbits -= 32;
    uint32_t chunk = static_cast<uint32_t>(acc >> nbits);
    acc &= (1ull << nbits) - 1;
    // SWAR any-byte-is-0xFF: low7==0x7F propagates a carry into bit 7.
    if ((((chunk & 0x7F7F7F7Fu) + 0x01010101u) & chunk & 0x80808080u) == 0) {
      uint32_t be = __builtin_bswap32(chunk);
      std::memcpy(out.data() + w, &be, 4);
      w += 4;
      return;
    }
    uint8_t* b = out.data();
    for (int i = 24; i >= 0; i -= 8) {
      uint8_t v = static_cast<uint8_t>(chunk >> i);
      b[w++] = v;
      if (v == 0xFF) b[w++] = 0x00;
    }
  }

  inline void align() {  // 1-fill (spec F.1.2.3)
    ensure(16);
    if (nbits & 7) {
      int pad = 8 - (nbits & 7);
      acc = (acc << pad) | ((1u << pad) - 1);
      nbits += pad;
    }
    drain_byte_loop();
  }
};

inline int csize_fast(int32_t v) {  // bit category (Table F.1)
  // 0u - cast avoids signed-overflow UB for INT32_MIN.
  uint32_t a = v < 0 ? 0u - static_cast<uint32_t>(v)
                     : static_cast<uint32_t>(v);
  return a == 0 ? 0 : 32 - __builtin_clz(a);
}

struct EncodeArgs {
  const int32_t* blocks;  // [n_units_total, 64] zigzag, MCU order
  int64_t total_units;
  int32_t units_per_mcu;
  const int32_t* unit_sci;     // [units_per_mcu]
  const int32_t* unit_dc;      // [units_per_mcu] table index
  const int32_t* unit_ac;      // [units_per_mcu]
  const EncTable* tables_dc;
  const EncTable* tables_ac;
  int64_t ri;  // restart interval in MCUs (0 = none)
};

// Pack MCUs [mcu_lo, mcu_hi) into bp. Returns 0 or 1 on absent symbol.
// Each (code, EXTEND) pair is emitted as ONE put of <= 31 bits (halves
// the accumulator traffic vs separate puts; bit-identical output).
int pack_range(const EncodeArgs& a, int64_t mcu_lo, int64_t mcu_hi,
               BitPacker& bp) {
  // Worst case one DU emits 64 * (16+15) bits = 248 B, *2 if every byte
  // stuffs, + the 8-byte fast-path store margin.
  constexpr size_t kDuCap = 2 * 248 + 16;
  int32_t preds[4] = {0, 0, 0, 0};
  for (int64_t m = mcu_lo; m < mcu_hi; m++) {
    const int32_t* unit = a.blocks + m * a.units_per_mcu * 64;
    for (int32_t u = 0; u < a.units_per_mcu; u++, unit += 64) {
      const EncTable& dct = a.tables_dc[a.unit_dc[u]];
      const EncTable& act = a.tables_ac[a.unit_ac[u]];
      int32_t sci = a.unit_sci[u];
      bp.ensure(kDuCap);

      int32_t dc = unit[0];
      int32_t diff = dc - preds[sci];
      preds[sci] = dc;
      int s = csize_fast(diff);
      // Out-of-range magnitudes must error, not alias into the run nibble
      // of (run << 4 | s) and emit a decodable-but-wrong symbol.
      if (s > 15 || dct.size[s] == 0) return 1;
      uint32_t ext = static_cast<uint32_t>(diff >= 0 ? diff
                                                     : diff + (1 << s) - 1);
      bp.put((static_cast<uint32_t>(dct.code[s]) << s) |
                 (ext & ((1u << s) - 1)),
             dct.size[s] + s);

#if defined(__AVX2__)
      // Nonzero-position mask for unit[0..63] (8 cmpeq+movemask), then a
      // ctz walk over just the ~nonzero coefficients. The scalar loop's
      // per-coefficient zero test mispredicts heavily on natural content
      // (zero runs are data-random); the mask walk touches only emitted
      // symbols and derives each run length arithmetically.
      uint64_t nz = 0;
      for (int g = 0; g < 64; g += 8) {
        __m256i v8 = _mm256_loadu_si256(
            reinterpret_cast<const __m256i*>(unit + g));
        __m256i z = _mm256_cmpeq_epi32(v8, _mm256_setzero_si256());
        uint32_t zm = static_cast<uint32_t>(
            _mm256_movemask_ps(_mm256_castsi256_ps(z)));
        nz |= static_cast<uint64_t>(~zm & 0xFFu) << g;
      }
      nz &= ~1ull;  // DC handled above
      int prev = 0;
      while (nz) {
        int k = __builtin_ctzll(nz);
        nz &= nz - 1;
        int run = k - prev - 1;
        prev = k;
        while (run >= 16) {
          if (act.size[0xF0] == 0) return 1;
          bp.put(act.code[0xF0], act.size[0xF0]);  // ZRL
          run -= 16;
        }
        int32_t v = unit[k];
        s = csize_fast(v);
        if (s > 15) return 1;
        int sym = (run << 4) | s;
        if (act.size[sym] == 0) return 1;
        ext = static_cast<uint32_t>(v >= 0 ? v : v + (1 << s) - 1);
        bp.put((static_cast<uint32_t>(act.code[sym]) << s) |
                   (ext & ((1u << s) - 1)),
               act.size[sym] + s);
      }
      if (prev < 63) {
        if (act.size[0x00] == 0) return 1;
        bp.put(act.code[0x00], act.size[0x00]);  // EOB
      }
#else
      int run = 0;
      for (int k = 1; k < 64; k++) {
        int32_t v = unit[k];
        if (v == 0) {
          run++;
          continue;
        }
        while (run >= 16) {
          if (act.size[0xF0] == 0) return 1;
          bp.put(act.code[0xF0], act.size[0xF0]);  // ZRL
          run -= 16;
        }
        s = csize_fast(v);
        if (s > 15) return 1;
        int sym = (run << 4) | s;
        if (act.size[sym] == 0) return 1;
        ext = static_cast<uint32_t>(v >= 0 ? v : v + (1 << s) - 1);
        bp.put((static_cast<uint32_t>(act.code[sym]) << s) |
                   (ext & ((1u << s) - 1)),
               act.size[sym] + s);
        run = 0;
      }
      if (run) {
        if (act.size[0x00] == 0) return 1;
        bp.put(act.code[0x00], act.size[0x00]);  // EOB
      }
#endif
    }
  }
  return 0;
}

}  // namespace

extern "C" {

void jdt_free(uint8_t* p) { std::free(p); }

// Pack a whole scan. Returns malloc'd buffer in *out (caller jdt_free's),
// length in *out_len; returns 0 on success.
int32_t jdt_encode_scan(const int32_t* blocks, int64_t total_units,
                        int32_t units_per_mcu, const int32_t* unit_sci,
                        const int32_t* unit_dc, const int32_t* unit_ac,
                        const uint16_t* const* dc_codes,
                        const uint8_t* const* dc_sizes, int32_t n_dc,
                        const uint16_t* const* ac_codes,
                        const uint8_t* const* ac_sizes, int32_t n_ac,
                        int64_t ri, int32_t n_threads, uint8_t** out,
                        int64_t* out_len) {
  if (total_units <= 0 || units_per_mcu <= 0 ||
      total_units % units_per_mcu != 0)
    return 2;
  std::vector<EncTable> tdc(n_dc), tac(n_ac);
  for (int32_t i = 0; i < n_dc; i++) tdc[i] = EncTable{dc_codes[i], dc_sizes[i]};
  for (int32_t i = 0; i < n_ac; i++) tac[i] = EncTable{ac_codes[i], ac_sizes[i]};
  EncodeArgs a{blocks, total_units, units_per_mcu, unit_sci,
               unit_dc, unit_ac, tdc.data(), tac.data(), ri};
  int64_t total_mcus = total_units / units_per_mcu;

  int64_t n_segs = (ri > 0) ? (total_mcus + ri - 1) / ri : 1;
  std::vector<BitPacker> packers(n_segs);
  std::atomic<int32_t> status(0);

  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  int workers =
      static_cast<int>(std::min<int64_t>(std::max(1, n_threads), n_segs));
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t s = next.fetch_add(1);
      if (s >= n_segs || status.load(std::memory_order_relaxed)) return;
      int64_t lo = ri ? s * ri : 0;
      int64_t hi = ri ? std::min<int64_t>(lo + ri, total_mcus) : total_mcus;
      int rc = pack_range(a, lo, hi, packers[s]);
      packers[s].align();
      if (rc) status.store(rc);
    }
  };
  if (workers <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < workers; t++) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  if (int32_t rc = status.load()) return rc;

  int64_t total = 0;
  for (auto& p : packers) total += static_cast<int64_t>(p.w);
  total += 2 * (n_segs - 1);  // RSTn markers
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(std::max<int64_t>(total, 1)));
  if (!buf) return 3;
  int64_t off = 0;
  for (int64_t s = 0; s < n_segs; s++) {
    std::memcpy(buf + off, packers[s].out.data(), packers[s].w);
    off += static_cast<int64_t>(packers[s].w);
    if (s + 1 < n_segs) {
      buf[off++] = 0xFF;
      buf[off++] = 0xD0 + static_cast<uint8_t>(s & 7);
    }
  }
  *out = buf;
  *out_len = off;
  return 0;
}

}  // extern "C"
