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

namespace {

struct EncTable {
  const uint16_t* code;  // [256]
  const uint8_t* size;   // [256]
};

struct BitPacker {
  std::vector<uint8_t> out;
  uint64_t acc = 0;
  int nbits = 0;

  inline void put(uint32_t value, int n) {
    if (n == 0) return;
    acc = (acc << n) | (value & ((1u << n) - 1));
    nbits += n;
    while (nbits >= 8) {
      nbits -= 8;
      uint8_t b = static_cast<uint8_t>(acc >> nbits);
      out.push_back(b);
      if (b == 0xFF) out.push_back(0x00);  // stuffing (spec B.1.1.5)
    }
    acc &= (1ull << nbits) - 1;
  }

  inline void align() {  // 1-fill (spec F.1.2.3)
    if (nbits) put(0xFF, 8 - nbits);
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
int pack_range(const EncodeArgs& a, int64_t mcu_lo, int64_t mcu_hi,
               BitPacker& bp) {
  int32_t preds[4] = {0, 0, 0, 0};
  for (int64_t m = mcu_lo; m < mcu_hi; m++) {
    const int32_t* unit = a.blocks + m * a.units_per_mcu * 64;
    for (int32_t u = 0; u < a.units_per_mcu; u++, unit += 64) {
      const EncTable& dct = a.tables_dc[a.unit_dc[u]];
      const EncTable& act = a.tables_ac[a.unit_ac[u]];
      int32_t sci = a.unit_sci[u];

      int32_t dc = unit[0];
      int32_t diff = dc - preds[sci];
      preds[sci] = dc;
      int s = csize_fast(diff);
      // Out-of-range magnitudes must error, not alias into the run nibble
      // of (run << 4 | s) and emit a decodable-but-wrong symbol.
      if (s > 15 || dct.size[s] == 0) return 1;
      bp.put(dct.code[s], dct.size[s]);
      if (s) bp.put(diff >= 0 ? diff : diff + (1 << s) - 1, s);

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
        bp.put(act.code[sym], act.size[sym]);
        bp.put(v >= 0 ? v : v + (1 << s) - 1, s);
        run = 0;
      }
      if (run) {
        if (act.size[0x00] == 0) return 1;
        bp.put(act.code[0x00], act.size[0x00]);  // EOB
      }
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
  for (auto& p : packers) total += static_cast<int64_t>(p.out.size());
  total += 2 * (n_segs - 1);  // RSTn markers
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(std::max<int64_t>(total, 1)));
  if (!buf) return 3;
  int64_t off = 0;
  for (int64_t s = 0; s < n_segs; s++) {
    std::memcpy(buf + off, packers[s].out.data(), packers[s].out.size());
    off += static_cast<int64_t>(packers[s].out.size());
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
