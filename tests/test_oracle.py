"""Oracle decoder behavior tests that don't need the compiled reference:
Pillow cross-checks (tolerance-based), parser structure checks, and error
handling (no silent failures, unlike decode.c:861,868)."""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu.core.oracle import decode
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.utils.config import DecodeConfig, Quirks
from jpeg_decoder_tpu.utils.errors import JpegError, JpegFormatError

from .corpus import baseline_corpus, make_jpeg

CORRECT = DecodeConfig(quirks=Quirks.CORRECT)


def pil_rgb(data: bytes) -> np.ndarray:
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def test_gray_matches_pillow_within_1(rng):
    g = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    data = make_jpeg(g, "L", quality=85)
    img = decode(data, CORRECT)
    d = np.abs(img.rgb.astype(int) - pil_rgb(data).astype(int))
    assert d.max() <= 1  # matches SURVEY.md §6 measured accuracy


def test_444_matches_pillow_within_4(rng):
    c = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    data = make_jpeg(c, "RGB", quality=90, subsampling=0)
    img = decode(data, CORRECT)
    d = np.abs(img.rgb.astype(int) - pil_rgb(data).astype(int))
    assert d.max() <= 4  # float-vs-int color convert, truncation vs rounding


def test_420_constant_chroma_close_to_pillow(rng):
    """With constant chroma the NN-vs-fancy upsample difference vanishes
    (SURVEY.md §6: ±3)."""
    y = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    ycc = np.stack([y, np.full_like(y, 140), np.full_like(y, 90)], axis=-1)
    im = Image.fromarray(ycc, "YCbCr")
    buf = io.BytesIO()
    im.save(buf, "JPEG", quality=92, subsampling=2)
    data = buf.getvalue()
    img = decode(data, CORRECT)
    d = np.abs(img.rgb.astype(int) - pil_rgb(data).astype(int))
    assert d.max() <= 3


def test_parse_structure(rng):
    c = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    data = make_jpeg(c, "RGB", quality=90, subsampling=2, restart_marker_rows=2)
    s = parse(data)
    assert s.frame.width == 64 and s.frame.height == 64
    assert s.frame.ncs == 3
    assert s.frame.components[0].hsf == 2 and s.frame.components[0].vsf == 2
    assert len(s.scans) == 1
    scan = s.scans[0]
    assert scan.restart_interval > 0
    assert scan.span.num_segments > 1
    # every restart offset must point at an actual RSTn marker
    for off in scan.span.restart_offsets:
        assert s.data[off] == 0xFF
        assert 0xD0 <= s.data[off + 1] <= 0xD7


def test_all_corpus_decodes():
    for name, data in baseline_corpus():
        img = decode(data, CORRECT)
        assert img.rgb is not None and img.rgb.size > 0, name


def test_garbage_raises():
    with pytest.raises(JpegError):
        decode(b"\x00" * 100)
    with pytest.raises(JpegError):
        decode(b"\xff\xd8\xff\xee\x00\x04ab")  # SOI + APP-ish, no SOF/SOS


def test_truncated_raises(rng):
    g = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    data = make_jpeg(g, "L", quality=85)
    with pytest.raises(JpegError):
        decode(data[: len(data) // 3])


def test_quirk_modes_differ_only_at_boundaries(rng):
    c = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = make_jpeg(c, "RGB", quality=90, subsampling=0)
    a = decode(data, DecodeConfig(quirks=Quirks.REFERENCE)).rgb.astype(int)
    b = decode(data, DecodeConfig(quirks=Quirks.CORRECT)).rgb.astype(int)
    # CORRECT rounds, REFERENCE truncates: difference at most 1 everywhere.
    assert np.abs(a - b).max() <= 1
