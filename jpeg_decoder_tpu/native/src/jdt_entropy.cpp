// jdt_entropy.cpp — native restart-segment-parallel JPEG entropy decode.
//
// This is the TPU framework's host runtime for the one inherently serial
// stage of JPEG decoding: Huffman/entropy decode of a scan into the
// coefficient-plane IR. The reference decodes bit-by-bit, one call per
// compressed bit (`next_bit` /root/reference/src/bitstream.c:61-67) inside a
// per-MCU interleaved loop (`decode_scan` decode.c:535-663). Here:
//
//   * a 64-bit bit-buffer with inline 0xFF00 unstuffing replaces the
//     per-bit calls (refill amortized to ~7 bytes at a time);
//   * Huffman symbols resolve through a flat 16-bit-indexed LUT
//     (one lookup per symbol) instead of the <=16-step compare walk
//     (decode.c:674-681);
//   * restart segments — which the reference uses only for error resync
//     (decode.c:578-590) — are decoded CONCURRENTLY, one worker per
//     segment, since DC predictors and bit alignment reset at every RSTn;
//   * errors return codes with positions; there is no exit() anywhere
//     (the reference silently exit(1)s on malformed progressive data,
//     decode.c:861,868).
//
// Progressive scans (spec G.1.2: DC first/refine, AC first/refine with
// EOB-run accounting) use the same machinery — the reference's progressive
// path is broken and is not the model; core/oracle.py is.
//
// C ABI only (loaded via ctypes); no Python.h dependency.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

enum JdtStatus : int32_t {
  JDT_OK = 0,
  JDT_ERR_BAD_CODE = 1,    // invalid Huffman prefix
  JDT_ERR_COEF_RANGE = 2,  // coefficient index out of range
  JDT_ERR_TRUNCATED = 3,   // ran off the end of entropy data
  JDT_ERR_BAD_ARG = 4,
};

// ---------------------------------------------------------------------------
// Bit reader: 64-bit buffer, MSB-aligned, inline FF00 unstuffing.
// Segment byte bounds exclude all markers (the Python prescan guarantees
// this), so inside a segment 0xFF is always followed by a stuffed 0x00.
// ---------------------------------------------------------------------------
struct BitReader {
  const uint8_t* p = nullptr;
  const uint8_t* end = nullptr;
  uint64_t buf = 0;  // MSB-first: next bit is bit 63
  int nbits = 0;
  int64_t padded = 0;  // zero bytes fabricated past the end

  void init(const uint8_t* start, const uint8_t* stop) {
    p = start;
    end = stop;
    buf = 0;
    nbits = 0;
    padded = 0;
  }

  static inline bool has_ff6(uint64_t v) {
    // Any 0xFF byte among the low 6 bytes (SWAR zero-byte test on ~v).
    uint64_t x = ~(v | 0xFFFF000000000000ull);
    return ((x - 0x0101010101010101ull) & ~x & 0x8080808080808080ull) != 0;
  }

  inline void fill() {
    // Contract: on return, nbits >= 33 — enough for one Huffman code
    // (<= 16 bits) plus its extend bits (<= 16) without another refill.
    if (nbits > 32) return;
    // Fast path: bulk-insert clean bytes (no 0xFF, so no unstuffing and no
    // marker concerns) with one unaligned load — the common case for
    // high-entropy streams, ~6x fewer iterations than the byte loop.
    if (p + 8 <= end) {
      uint64_t v;
      std::memcpy(&v, p, 8);
      if (!has_ff6(v)) {
        uint64_t be = __builtin_bswap64(v);
        if (nbits <= 16) {
          buf |= (be & ~0xFFFFull) >> nbits;  // top 48 bits
          nbits += 48;
          p += 6;
        } else {
          buf |= (be & ~0xFFFFFFFFull) >> nbits;  // top 32 bits
          nbits += 32;
          p += 4;
        }
        return;
      }
    }
    while (nbits <= 56) {
      uint8_t b = 0;
      if (p < end) {
        b = *p++;
        if (b == 0xFF && p < end && *p == 0x00) p++;  // unstuff
      } else {
        padded++;
      }
      buf |= static_cast<uint64_t>(b) << (56 - nbits);
      nbits += 8;
    }
  }

  inline uint32_t peek16() {
    fill();
    return static_cast<uint32_t>(buf >> 48);
  }

  inline void consume(int n) {
    buf <<= n;
    nbits -= n;
  }

  inline int32_t receive(int n) {
    if (n == 0) return 0;
    fill();
    int32_t v = static_cast<int32_t>(buf >> (64 - n));
    consume(n);
    return v;
  }

  inline int32_t bit() {
    fill();
    int32_t v = static_cast<int32_t>(buf >> 63);
    consume(1);
    return v;
  }

  // More than one fabricated byte consumed => genuinely truncated input
  // (a partial final byte of padding is normal).
  inline bool overran() const { return padded > 8; }
};

inline int32_t extend(int32_t v, int n) {
  // Spec F.2.2.1 EXTEND (reference decode.c:684-686).
  if (n == 0) return 0;
  if (v < (1 << (n - 1))) return v - (1 << n) + 1;
  return v;
}

struct HuffLut {
  // Two-level decode LUT built from the Python-side flat tables:
  //   lut12 [4096]  — codes of length <= 12 keyed by the next 12 bits;
  //                   entry = (len << 8) | symbol, 0 = "go to lut16".
  //                   8 KB: L1-resident, hits on virtually every symbol
  //                   (JPEG code lengths concentrate well below 12 bits).
  //   lut16 [65536] — all codes keyed by the next 16 bits; entry likewise,
  //                   len 0 = invalid prefix.
  std::vector<uint16_t> lut12;
  std::vector<uint16_t> lut16;
  // vlut [4096] — AC fast path: code AND extend bits resolved by one
  // 12-bit-keyed lookup (libjpeg-turbo-style). Packed int32 entry:
  //   [15:0]  coefficient value (int16)
  //   [21:16] total bits consumed (code + extend)
  //   [25:22] zero run
  //   [27:26] kind: 0 = coefficient, 1 = EOB, 2 = ZRL, 3 = slow path
  std::vector<int32_t> vlut;
  enum { KIND_COEF = 0, KIND_EOB = 1, KIND_ZRL = 2, KIND_SLOW = 3 };

  void build(const uint8_t* symbol, const uint8_t* length) {
    lut16.resize(65536);
    lut12.assign(4096, 0);
    for (uint32_t i = 0; i < 65536; i++) {
      lut16[i] = static_cast<uint16_t>((length[i] << 8) | symbol[i]);
    }
    for (uint32_t i = 0; i < 4096; i++) {
      uint32_t j = i << 4;
      int len = length[j];
      if (len != 0 && len <= 12) lut12[i] = lut16[j];
    }
    vlut.assign(4096, KIND_SLOW << 26);
    for (uint32_t i = 0; i < 4096; i++) {
      uint32_t j = i << 4;
      int len = length[j];
      if (len == 0 || len > 12) continue;
      int sym = symbol[j];
      int run = sym >> 4;
      int size = sym & 0x0F;
      if (sym == 0x00) {
        vlut[i] = (KIND_EOB << 26) | (len << 16);
      } else if (sym == 0xF0) {
        vlut[i] = (KIND_ZRL << 26) | (len << 16);
      } else if (len + size <= 12) {
        int32_t vbits =
            size ? static_cast<int32_t>((i >> (12 - len - size)) &
                                        ((1u << size) - 1))
                 : 0;
        int32_t value = extend(vbits, size);
        vlut[i] = (KIND_COEF << 26) | (run << 22) | ((len + size) << 16) |
                  (value & 0xFFFF);
      }
    }
  }

  inline int decode(BitReader& br, int32_t* sym) const {
    uint32_t idx = br.peek16();
    uint32_t e = lut12[idx >> 4];
    if (e == 0) {
      e = lut16[idx];
      if ((e >> 8) == 0) return JDT_ERR_BAD_CODE;
    }
    *sym = e & 0xFF;
    br.consume(e >> 8);
    return JDT_OK;
  }
};

// Per data-unit-in-MCU layout, 11 int32s from Python (see
// native/runtime.py _unit_params; coordinate math mirrors the block form of
// write_mcu decode.c:475-486 / oracle._block_position).
struct UnitLayout {
  int32_t plane;     // frame-component index
  int32_t scomp;     // scan-component index (DC predictor slot)
  int32_t dc_lut;    // index into luts[]
  int32_t ac_lut;
  int32_t h, v;      // effective sampling factors
  int32_t j, k;      // unit position within the MCU
  int32_t wrap;      // block-column wrap width
  int32_t plane_bw;  // plane width in blocks
  int32_t plane_bh;  // plane height in blocks
};

struct ScanContext {
  const uint8_t* data;
  const int64_t* seg_bounds;  // [2 * n_segs]
  int64_t n_segs;
  int64_t total_mcus;
  int64_t ri;
  std::vector<UnitLayout> units;
  std::vector<HuffLut> luts;
  int32_t** planes;
};

inline int decode_du_sequential(BitReader& br, const HuffLut& dc,
                                const HuffLut& ac, int32_t* pred,
                                int32_t* du) {
  // Mirrors decode_data_unit (decode.c:665-723); writes 64 zigzag coeffs.
  // One fill() per symbol covers both the code (<=16 bits) and its extend
  // bits (<=16): after consuming the code, >=41 buffered bits remain.
  std::memset(du, 0, 64 * sizeof(int32_t));
  br.fill();
  uint32_t idx = static_cast<uint32_t>(br.buf >> 48);
  uint32_t e = dc.lut12[idx >> 4];
  if (e == 0) {
    e = dc.lut16[idx];
    if ((e >> 8) == 0) return JDT_ERR_BAD_CODE;
  }
  int s = e & 0xFF;
  br.consume(e >> 8);
  if (s > 15) return JDT_ERR_COEF_RANGE;
  if (s) {
    int32_t v = static_cast<int32_t>(br.buf >> (64 - s));
    br.consume(s);
    *pred += extend(v, s);
  }
  du[0] = *pred;

  int i = 1;
  while (i < 64) {
    br.fill();
    uint32_t idx12 = static_cast<uint32_t>(br.buf >> 52);
    int32_t en = ac.vlut[idx12];
    int kind = (en >> 26) & 3;
    if (kind == HuffLut::KIND_COEF) {
      // code + extend resolved by the single lookup
      i += (en >> 22) & 0x0F;
      if (i > 63) return JDT_ERR_COEF_RANGE;
      du[i] = static_cast<int16_t>(en & 0xFFFF);
      br.consume((en >> 16) & 0x3F);
      i++;
      continue;
    }
    if (kind == HuffLut::KIND_EOB) {
      br.consume((en >> 16) & 0x3F);
      break;
    }
    if (kind == HuffLut::KIND_ZRL) {
      br.consume((en >> 16) & 0x3F);
      i += 16;
      continue;
    }
    // Slow path: long code or long extend — full 16-bit decode.
    idx = static_cast<uint32_t>(br.buf >> 48);
    e = ac.lut12[idx >> 4];
    if (e == 0) {
      e = ac.lut16[idx];
      if ((e >> 8) == 0) return JDT_ERR_BAD_CODE;
    }
    br.consume(e >> 8);
    int sym = e & 0xFF;
    int run = sym >> 4;
    int size = sym & 0x0F;
    i += run;
    if (sym == 0x00) break;  // EOB
    if (sym == 0xF0) {       // ZRL (15 zeros + the i++ below)
      i += 1;
      continue;
    }
    if (i > 63) return JDT_ERR_COEF_RANGE;
    if (size) {
      int32_t v = static_cast<int32_t>(br.buf >> (64 - size));
      br.consume(size);
      du[i] = extend(v, size);
    }
    i++;
  }
  return br.overran() ? JDT_ERR_TRUNCATED : JDT_OK;
}

int decode_segment_sequential(const ScanContext& c, int64_t seg,
                              int64_t* err_mcu) {
  BitReader br;
  br.init(c.data + c.seg_bounds[2 * seg], c.data + c.seg_bounds[2 * seg + 1]);
  int64_t mcu_lo = c.ri ? seg * c.ri : 0;
  int64_t mcu_hi = c.ri ? std::min<int64_t>(mcu_lo + c.ri, c.total_mcus)
                        : c.total_mcus;
  int32_t preds[4] = {0, 0, 0, 0};
  int32_t scratch[64];  // sink for the rare out-of-plane blocks

  for (int64_t m = mcu_lo; m < mcu_hi; m++) {
    for (const UnitLayout& ul : c.units) {
      int64_t base = m * ul.h + ul.k;
      int64_t bx = base % ul.wrap;
      int64_t by = (base / ul.wrap) * ul.v + ul.j;
      // Decode straight into the plane (no staging buffer / memcpy).
      int32_t* du = (by < ul.plane_bh && bx < ul.plane_bw)
                        ? c.planes[ul.plane] + (by * ul.plane_bw + bx) * 64
                        : scratch;
      int rc = decode_du_sequential(br, c.luts[ul.dc_lut], c.luts[ul.ac_lut],
                                    &preds[ul.scomp], du);
      if (rc != JDT_OK) {
        *err_mcu = m;
        return rc;
      }
    }
  }
  return JDT_OK;
}

// ---------------------------------------------------------------------------
// Progressive passes (spec G.1.2; mirrors core/oracle.py, the validated
// model — NOT the reference's broken decode_progressive_scan).
// ---------------------------------------------------------------------------
struct ProgParams {
  int32_t ss, se, ah, al;
};

int decode_segment_progressive(const ScanContext& c, const ProgParams& pp,
                               int64_t seg, int64_t* err_mcu) {
  BitReader br;
  br.init(c.data + c.seg_bounds[2 * seg], c.data + c.seg_bounds[2 * seg + 1]);
  int64_t mcu_lo = c.ri ? seg * c.ri : 0;
  int64_t mcu_hi = c.ri ? std::min<int64_t>(mcu_lo + c.ri, c.total_mcus)
                        : c.total_mcus;
  int32_t preds[4] = {0, 0, 0, 0};
  int64_t eobrun = 0;
  const bool is_dc = pp.ss == 0;
  const int32_t p1 = 1 << pp.al;
  const int32_t m1 = -(1 << pp.al);
  int32_t scratch[64];  // sink for out-of-bounds blocks (never hit on
                        // well-formed streams; planes are MCU-padded)

  for (int64_t m = mcu_lo; m < mcu_hi; m++) {
    for (const UnitLayout& ul : c.units) {
      int64_t base = m * ul.h + ul.k;
      int64_t bx = base % ul.wrap;
      int64_t by = (base / ul.wrap) * ul.v + ul.j;
      bool in_bounds = by < ul.plane_bh && bx < ul.plane_bw;
      int32_t* coef =
          in_bounds ? c.planes[ul.plane] + (by * ul.plane_bw + bx) * 64
                    : scratch;

      if (is_dc && pp.ah == 0) {
        int32_t s;
        int rc = c.luts[ul.dc_lut].decode(br, &s);
        if (rc != JDT_OK) { *err_mcu = m; return rc; }
        if (s > 15) { *err_mcu = m; return JDT_ERR_COEF_RANGE; }
        preds[ul.scomp] += extend(br.receive(s), s);
        coef[0] = preds[ul.scomp] << pp.al;
      } else if (is_dc) {
        // DC refine (G.1.2.1). The reference omits the <<al shift
        // (decode.c:1055) — that is a bug, not a parity target.
        if (br.bit()) coef[0] |= p1;
      } else if (pp.ah == 0) {
        // AC first pass (G.1.2.2).
        if (eobrun > 0) {
          eobrun--;
        } else {
          int k = pp.ss;
          while (k <= pp.se) {
            int32_t s;
            int rc = c.luts[ul.ac_lut].decode(br, &s);
            if (rc != JDT_OK) { *err_mcu = m; return rc; }
            int run = (s >> 4) & 0x0F;
            int size = s & 0x0F;
            if (size == 0) {
              if (run == 15) { k += 16; continue; }  // ZRL
              eobrun = (1 << run) - 1;
              if (run) eobrun += br.receive(run);
              break;
            }
            k += run;
            if (k > pp.se) { *err_mcu = m; return JDT_ERR_COEF_RANGE; }
            coef[k] = extend(br.receive(size), size) << pp.al;
            k++;
          }
        }
      } else {
        // AC refinement pass (G.1.2.3).
        int k = pp.ss;
        if (eobrun == 0) {
          while (k <= pp.se) {
            int32_t s;
            int rc = c.luts[ul.ac_lut].decode(br, &s);
            if (rc != JDT_OK) { *err_mcu = m; return rc; }
            int run = (s >> 4) & 0x0F;
            int size = s & 0x0F;
            int32_t val = 0;
            if (size == 0) {
              if (run != 15) {
                eobrun = 1 << run;
                if (run) eobrun += br.receive(run);
                break;
              }
              // ZRL: skip 16 zero-history coefficients
            } else {
              if (size != 1) { *err_mcu = m; return JDT_ERR_COEF_RANGE; }
              val = br.bit() ? p1 : m1;
            }
            while (k <= pp.se) {
              if (coef[k] != 0) {
                if (br.bit() && (coef[k] & p1) == 0)
                  coef[k] += coef[k] >= 0 ? p1 : m1;
              } else {
                if (run == 0) break;
                run--;
              }
              k++;
            }
            if (val != 0 && k <= pp.se) coef[k] = val;
            k++;
          }
        }
        if (eobrun > 0) {
          while (k <= pp.se) {
            if (coef[k] != 0) {
              if (br.bit() && (coef[k] & p1) == 0)
                coef[k] += coef[k] >= 0 ? p1 : m1;
            }
            k++;
          }
          eobrun--;
        }
      }
      if (br.overran()) { *err_mcu = m; return JDT_ERR_TRUNCATED; }
    }
  }
  return JDT_OK;
}

template <typename SegFn>
int32_t run_segments(const ScanContext& c, int32_t n_threads, int64_t* err_out,
                     SegFn seg_fn) {
  int64_t n = c.n_segs;
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  int workers = static_cast<int>(std::min<int64_t>(n_threads, n));
  if (workers <= 1) {
    for (int64_t s = 0; s < n; s++) {
      int64_t err_mcu = -1;
      int rc = seg_fn(c, s, &err_mcu);
      if (rc != JDT_OK) {
        err_out[0] = s;
        err_out[1] = err_mcu;
        return rc;
      }
    }
    return JDT_OK;
  }
  std::atomic<int64_t> next(0);
  std::atomic<int32_t> status(JDT_OK);
  std::atomic<int64_t> err_seg(-1), err_mcu_a(-1);
  auto worker = [&]() {
    for (;;) {
      int64_t s = next.fetch_add(1);
      if (s >= n || status.load(std::memory_order_relaxed) != JDT_OK) return;
      int64_t err_mcu = -1;
      int rc = seg_fn(c, s, &err_mcu);
      if (rc != JDT_OK) {
        int32_t expected = JDT_OK;
        if (status.compare_exchange_strong(expected, rc)) {
          err_seg.store(s);
          err_mcu_a.store(err_mcu);
        }
        return;
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < workers; t++) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  err_out[0] = err_seg.load();
  err_out[1] = err_mcu_a.load();
  return status.load();
}

ScanContext build_context(const uint8_t* data, const int64_t* seg_bounds,
                          int64_t n_segs, int64_t total_mcus, int64_t ri,
                          const int32_t* unit_params, int32_t n_units,
                          const uint8_t* const* lut_symbols,
                          const uint8_t* const* lut_lengths, int32_t n_luts,
                          int32_t** planes) {
  ScanContext c;
  c.data = data;
  c.seg_bounds = seg_bounds;
  c.n_segs = n_segs;
  c.total_mcus = total_mcus;
  c.ri = ri;
  c.units.resize(n_units);
  for (int32_t u = 0; u < n_units; u++) {
    const int32_t* q = unit_params + u * 11;
    c.units[u] = UnitLayout{q[0], q[1], q[2], q[3], q[4], q[5],
                            q[6], q[7], q[8], q[9], q[10]};
  }
  c.luts.resize(n_luts);
  for (int32_t t = 0; t < n_luts; t++)
    c.luts[t].build(lut_symbols[t], lut_lengths[t]);
  c.planes = planes;
  return c;
}

}  // namespace

extern "C" {

int32_t jdt_version() { return 1; }

// Sequential (baseline/extended) scan, segment-parallel.
// unit_params: n_units x 11 int32 (see UnitLayout). err_out: [seg, mcu].
int32_t jdt_decode_sequential(const uint8_t* data, const int64_t* seg_bounds,
                              int64_t n_segs, int64_t total_mcus, int64_t ri,
                              const int32_t* unit_params, int32_t n_units,
                              const uint8_t* const* lut_symbols,
                              const uint8_t* const* lut_lengths,
                              int32_t n_luts, int32_t** planes,
                              int32_t n_threads, int64_t* err_out) {
  if (n_segs <= 0 || n_units <= 0 || n_luts <= 0) return JDT_ERR_BAD_ARG;
  ScanContext c = build_context(data, seg_bounds, n_segs, total_mcus, ri,
                                unit_params, n_units, lut_symbols,
                                lut_lengths, n_luts, planes);
  return run_segments(c, n_threads, err_out, decode_segment_sequential);
}

// Progressive scan (any of the four pass kinds), segment-parallel.
int32_t jdt_decode_progressive(const uint8_t* data, const int64_t* seg_bounds,
                               int64_t n_segs, int64_t total_mcus, int64_t ri,
                               const int32_t* unit_params, int32_t n_units,
                               const uint8_t* const* lut_symbols,
                               const uint8_t* const* lut_lengths,
                               int32_t n_luts, int32_t** planes,
                               int32_t ss, int32_t se, int32_t ah, int32_t al,
                               int32_t n_threads, int64_t* err_out) {
  if (n_segs <= 0 || n_units <= 0) return JDT_ERR_BAD_ARG;
  ScanContext c = build_context(data, seg_bounds, n_segs, total_mcus, ri,
                                unit_params, n_units, lut_symbols,
                                lut_lengths, n_luts, planes);
  ProgParams pp{ss, se, ah, al};
  return run_segments(c, n_threads, err_out,
                      [&pp](const ScanContext& ctx, int64_t seg,
                            int64_t* err_mcu) {
                        return decode_segment_progressive(ctx, pp, seg,
                                                          err_mcu);
                      });
}

}  // extern "C"
