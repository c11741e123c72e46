"""Geometry edge cases end-to-end: tiny, 1-pixel-tall/wide, non-multiple-of-
MCU shapes, 16-bit quant tables — decoded through the production path and
cross-checked against the oracle (itself reference-parity anchored)."""

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu.core import oracle
from jpeg_decoder_tpu.models import decoder, encoder
from jpeg_decoder_tpu.utils.config import DecodeConfig, EncodeConfig, EntropyBackend

from .corpus import make_jpeg

CFG = DecodeConfig(entropy_backend=EntropyBackend.NATIVE)


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (1, 64), (64, 1), (7, 9), (8, 8), (9, 8), (17, 1023)],
    ids=str,
)
@pytest.mark.parametrize("sub", [0, 2], ids=["444", "420"])
@pytest.mark.slow  # exhaustive odd-shape sweep
def test_odd_shapes_match_oracle(shape, sub, rng):
    arr = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
    data = make_jpeg(arr, "RGB", quality=85, subsampling=sub)
    want = oracle.decode(data)
    got = decoder.decode(data, CFG)
    assert got.rgb.shape == shape + (3,)
    np.testing.assert_array_equal(got.rgb, want.rgb)


@pytest.mark.parametrize("shape", [(1, 1), (3, 200), (200, 3)], ids=str)
def test_odd_gray_shapes(shape, rng):
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    data = make_jpeg(arr, "L", quality=90)
    want = oracle.decode(data)
    got = decoder.decode(data, CFG)
    np.testing.assert_array_equal(got.rgb, want.rgb)


def test_16bit_quant_tables(rng):
    """DQT precision 1 (16-bit entries): synthesized via our writer, since
    common encoders never emit them."""
    from jpeg_decoder_tpu.core import entropy_encode, huffman
    from jpeg_decoder_tpu.io import writer
    from jpeg_decoder_tpu.io.parser import parse

    nb_y, nb_x = 2, 2
    n = nb_y * nb_x
    blocks = np.zeros((n, 64), dtype=np.int32)
    blocks[:, 0] = rng.integers(-50, 50, n)
    blocks[:, 1] = rng.integers(-20, 20, n)
    dc = huffman.annex_k_dc_luminance()
    ac = huffman.annex_k_ac_luminance()
    entropy = entropy_encode.encode_blocks(
        [(0, blocks[i]) for i in range(n)],
        [huffman.build_encode_table(dc)],
        [huffman.build_encode_table(ac)],
        [(0, 0)], 1, 0,
    )
    qt = np.full(64, 300, dtype=np.uint16)  # forces 16-bit precision
    data = b"".join([
        writer.soi(), writer.dqt(0, qt),
        writer.sof(nb_x * 8, nb_y * 8, [(1, 1, 1, 0)]),
        writer.dht(dc), writer.dht(ac),
        writer.sos([(1, 0, 0)]), entropy, writer.eoi(),
    ])
    s = parse(data)
    assert s.scans[0].quant_tables[0].precision == 1
    np.testing.assert_array_equal(s.scans[0].quant_tables[0].values, qt)
    want = oracle.decode(data)
    got = decoder.decode(data, CFG)
    np.testing.assert_array_equal(got.rgb, want.rgb)


def test_encoder_1x1_and_extremes():
    for shape in [(1, 1, 3), (1, 100, 3), (100, 1, 3)]:
        arr = np.full(shape, 99, dtype=np.uint8)
        data = encoder.encode(arr, EncodeConfig(quality=90, subsampling="444"))
        import io

        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert pil.shape == shape
        got = decoder.decode(data, CFG)
        assert got.rgb.shape == shape
        # Flat-color images survive JPEG almost exactly.
        assert np.abs(got.rgb.astype(int) - 99).max() <= 2
