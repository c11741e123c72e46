"""A crafted DHT can assign a long (13-16 bit) code to an AC symbol with
SSSS==0 that is neither EOB (0x00) nor ZRL (0xF0) — e.g. 0x10 (run=1,
size=0). The spec leaves such symbols undefined for sequential scans; the
engine's contract (all backends, matching the oracle) is: advance the run,
store extend(0, 0) == 0, continue. The native register-resident kernel's
K2_SLOW path previously computed `(w << len) >> (64 - size)` without
guarding size==0 — a shift by 64, undefined behavior (r2 advisor finding).
This stream pins that path: every AC table code is >= 9 bits (so the
12-bit value-LUT defers to the slow path) and every DU contains 0x10.
"""

import numpy as np
import pytest

from jpeg_decoder_tpu.core import huffman, oracle
from jpeg_decoder_tpu.core.types import CoefficientPlanes, HuffTableSpec
from jpeg_decoder_tpu.io import writer
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend


def _deep_table(table_class: int, symbols: list[int]) -> HuffTableSpec:
    counts = np.zeros(16, dtype=np.uint8)
    remaining = len(symbols)
    depth = 9
    while remaining > 1 and depth < 16:
        counts[depth - 1] = 1
        remaining -= 1
        depth += 1
    counts[15] = remaining
    return HuffTableSpec(
        table_class=table_class,
        table_id=0,
        counts=counts,
        symbols=np.array(symbols, dtype=np.uint8),
    )


def _pack(codes):
    """(code, length) pairs -> 1-padded, byte-stuffed entropy bytes."""
    bits = "".join(format(c, f"0{n}b") for c, n in codes)
    bits += "1" * (-len(bits) % 8)
    raw = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out = bytearray()
    for b in raw:
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def _make_stream(nb=6, ri=2):
    """nb*nb-block grayscale stream where every DU is:
    DC cat 0, AC 0x10 (run 1, SIZE 0 -> the UB-prone slow path), EOB."""
    dc_spec = _deep_table(0, [0])
    # sorted([0x00, 0x10]): 0x00 lands at depth 9, 0x10 at depth 16 (>12,
    # so the first-level LUT always defers it to the 16-bit slow path).
    ac_spec = _deep_table(1, [0x00, 0x10])
    dc_t = huffman.build_encode_table(dc_spec)
    ac_t = huffman.build_encode_table(ac_spec)

    def du_codes():
        return [
            (int(dc_t.code[0]), int(dc_t.size[0])),
            (int(ac_t.code[0x10]), int(ac_t.size[0x10])),
            (int(ac_t.code[0x00]), int(ac_t.size[0x00])),
        ]

    n = nb * nb
    segs = []
    for s0 in range(0, n, ri):
        codes = []
        for _ in range(min(ri, n - s0)):
            codes.extend(du_codes())
        segs.append(_pack(codes))
    entropy = bytearray(segs[0])
    for k, seg in enumerate(segs[1:]):
        entropy += bytes([0xFF, 0xD0 + (k % 8)])
        entropy += seg
    qt = np.full(64, 2, dtype=np.uint16)
    return b"".join([
        writer.soi(), writer.dqt(0, qt),
        writer.sof(nb * 8, nb * 8, [(1, 1, 1, 0)]),
        writer.dht(dc_spec), writer.dht(ac_spec),
        writer.dri(ri),
        writer.sos([(1, 0, 0)]), bytes(entropy), writer.eoi(),
    ])


@pytest.mark.parametrize(
    "backend",
    [EntropyBackend.ORACLE, EntropyBackend.NUMPY, EntropyBackend.NATIVE],
    ids=lambda b: b.value,
)
def test_zero_size_ac_symbol_all_backends(backend):
    data = _make_stream()
    s = parse(data)
    planes = CoefficientPlanes(s.frame)
    oracle.decode_sequential_scan(s, s.scans[0], planes)
    # Contract: the size-0 symbol stores a zero — the whole plane is zeros.
    np.testing.assert_array_equal(planes.plane(0), 0)

    from jpeg_decoder_tpu.models.decoder import _entropy_decode

    cfg = DecodeConfig(entropy_backend=backend)
    got, _ = _entropy_decode(s, cfg)
    np.testing.assert_array_equal(got.plane(0), planes.plane(0))


def test_zero_size_ac_native_multistream():
    """Force the register-resident multi-stream kernel (the path with the
    unguarded shift): many segments, explicit multi-thread config."""
    data = _make_stream(nb=12, ri=2)  # 72 segments
    s = parse(data)
    planes = CoefficientPlanes(s.frame)
    oracle.decode_sequential_scan(s, s.scans[0], planes)

    from jpeg_decoder_tpu.models.decoder import _entropy_decode

    cfg = DecodeConfig(entropy_backend=EntropyBackend.NATIVE, num_threads=4)
    got, _ = _entropy_decode(s, cfg)
    np.testing.assert_array_equal(got.plane(0), planes.plane(0))
