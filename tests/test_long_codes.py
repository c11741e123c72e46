"""Deliberate coverage of the decoder fast-path FALLBACKS: Huffman codes
longer than the 12-bit first-level LUT and extend sizes that overflow the
value-resolved LUT (len + size > 12). Natural corpora rarely hit these, so
a synthetic table with deep code assignments forces every path.
"""

import numpy as np
import pytest

from jpeg_decoder_tpu.core import entropy_encode, huffman, oracle
from jpeg_decoder_tpu.core.types import CoefficientPlanes, HuffTableSpec
from jpeg_decoder_tpu.io import writer
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend


def _deep_table(table_class: int, symbols: list[int]) -> HuffTableSpec:
    """A valid table whose codes are all >= 9 bits (prefix 9-bit code tree:
    put everything at depths 9..16 by chaining counts)."""
    counts = np.zeros(16, dtype=np.uint8)
    remaining = len(symbols)
    # one code at depth 9, one at 10, ... rest at 16 (canonical-legal).
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


def _make_stream(rng, nb=6):
    """Grayscale stream whose DC/AC tables are all-deep and whose AC values
    need big extend sizes."""
    n = nb * nb
    blocks = np.zeros((n, 64), dtype=np.int32)
    blocks[:, 0] = rng.integers(-900, 900, n)
    for i in range(n):
        pos = rng.choice(np.arange(1, 64), 8, replace=False)
        # |v| in [256, 1023]: size 9-10 -> len+size >= 18 (always slow path)
        blocks[i, pos] = rng.choice([-1, 1], 8) * rng.integers(256, 1024, 8)

    # DC diffs (predictor-dependent) can land in any category up to 11.
    used_dc = list(range(12))
    used_ac = set()
    for i in range(n):
        run = 0
        nz = np.flatnonzero(blocks[i, 1:]) + 1
        prev = 1
        for k in nz:
            r = int(k) - prev
            while r >= 16:
                used_ac.add(0xF0)
                r -= 16
            used_ac.add((r << 4) | int(abs(int(blocks[i, k]))).bit_length())
            prev = int(k) + 1
        if prev <= 63:
            used_ac.add(0x00)
    dc_spec = _deep_table(0, used_dc)
    ac_spec = _deep_table(1, sorted(used_ac))

    entropy = entropy_encode.encode_blocks(
        [(0, blocks[i]) for i in range(n)],
        [huffman.build_encode_table(dc_spec)],
        [huffman.build_encode_table(ac_spec)],
        [(0, 0)], 1, 2,  # restart interval 2: multi-segment too
    )
    qt = np.full(64, 2, dtype=np.uint16)
    data = b"".join([
        writer.soi(), writer.dqt(0, qt),
        writer.sof(nb * 8, nb * 8, [(1, 1, 1, 0)]),
        writer.dht(dc_spec), writer.dht(ac_spec),
        writer.dri(2),
        writer.sos([(1, 0, 0)]), entropy, writer.eoi(),
    ])
    return data, blocks


@pytest.mark.parametrize(
    "backend",
    [EntropyBackend.ORACLE, EntropyBackend.NUMPY, EntropyBackend.NATIVE,
     EntropyBackend.DEVICE],
    ids=lambda b: b.value,
)
def test_deep_codes_all_backends(backend, rng):
    data, blocks = _make_stream(rng)
    s = parse(data)
    # every code in these tables is >= 9 bits; most are > 12
    planes = CoefficientPlanes(s.frame)
    oracle.decode_sequential_scan(s, s.scans[0], planes)
    np.testing.assert_array_equal(planes.plane(0).reshape(-1, 64), blocks)

    from jpeg_decoder_tpu.models.decoder import _entropy_decode

    cfg = DecodeConfig(entropy_backend=backend)
    got, _ = _entropy_decode(s, cfg)
    np.testing.assert_array_equal(got.plane(0).reshape(-1, 64), blocks)


def test_deep_codes_full_pipeline(rng):
    data, blocks = _make_stream(rng)
    want = oracle.decode(data)
    got = decoder.decode(data, DecodeConfig(entropy_backend=EntropyBackend.NATIVE))
    np.testing.assert_array_equal(got.rgb, want.rgb)
