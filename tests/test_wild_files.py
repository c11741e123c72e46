"""Wild-file conformance: genuinely foreign JPEGs (real encoder outputs
gathered from packages installed in this image — provenance in
tests/wild_files/SOURCES.txt; none were produced by this repo's encoder or
its Pillow-generated corpus). VERDICT r2 item 5.

Contract per file, under Quirks.CORRECT:
  * the full pipeline (device stage on the test mesh) decodes it;
  * pixel-wise agreement with libjpeg (via Pillow) within the small bound
    that separates our exact-float IDCT/upsample from libjpeg's scaled
    integer implementations;
  * backends agree with each other bit-for-bit (the strong internal check);
  * the no-JAX host fallback (use_device=False) matches the device stage
    bit-for-bit, fancy upsampling included.
"""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend, Quirks

WILD_DIR = os.path.join(os.path.dirname(__file__), "wild_files")
# transcoded/: libjpeg-encoded (via Pillow) variants of the wild images
# covering shapes the found-in-the-image files are thin on — progressive,
# restart intervals, 4:2:2 / 4:4:4, optimized tables, 16-bit DQT, Adobe
# CMYK (generator: tests/tools/make_transcoded_corpus.py; provenance in
# SOURCES.txt). The ENCODER is foreign (libjpeg-turbo's bit packer /
# marker writer / table builder); only the pixels come from the corpus.
WILD = sorted(
    glob.glob(os.path.join(WILD_DIR, "*.jpg"))
    + glob.glob(os.path.join(WILD_DIR, "transcoded", "*.jpg"))
)


def _ids(paths):
    return [os.path.basename(p) for p in paths]


def test_corpus_is_large_enough():
    assert len(WILD) >= 30


def test_transcoded_corpus_covers_the_thin_axes():
    """The transcoded set must keep covering the shapes the r3 verdict
    called out: progressive, DRI, 16-bit DQT, 4-component Adobe CMYK,
    4:2:2 sampling."""
    from jpeg_decoder_tpu.io.markers import Encoding
    from jpeg_decoder_tpu.io.parser import parse

    shapes = {"progressive": 0, "dri": 0, "dqt16": 0, "cmyk": 0,
              "s422": 0}
    for p in glob.glob(os.path.join(WILD_DIR, "transcoded", "*.jpg")):
        s = parse(open(p, "rb").read())
        if s.frame.process == Encoding.PROGRESSIVE_DCT:
            shapes["progressive"] += 1
        if s.scans[0].restart_interval:
            shapes["dri"] += 1
        if any(qt.precision == 1
               for sc in s.scans for qt in sc.quant_tables.values()):
            shapes["dqt16"] += 1
        if s.frame.ncs == 4:
            shapes["cmyk"] += 1
        fs = {(c.hsf, c.vsf) for c in s.frame.components}
        if fs == {(2, 1), (1, 1)}:
            shapes["s422"] += 1
    assert shapes["progressive"] >= 3, shapes
    assert shapes["dri"] >= 2, shapes
    assert shapes["dqt16"] >= 1, shapes
    assert shapes["cmyk"] >= 1, shapes
    assert shapes["s422"] >= 1, shapes


@pytest.mark.slow  # full-corpus libjpeg sweep; backends_agree keeps quick coverage
@pytest.mark.parametrize("path", WILD, ids=_ids(WILD))
def test_wild_file_vs_libjpeg(path):
    data = open(path, "rb").read()
    pil = np.asarray(Image.open(path).convert("RGB"))
    cfg = DecodeConfig(
        quirks=Quirks.CORRECT,
        upsample="fancy",
        entropy_backend=EntropyBackend.NATIVE,
    )
    ours = decoder.decode(data, cfg).rgb
    assert ours.shape == pil.shape
    d = np.abs(ours.astype(int) - pil.astype(int))
    # libjpeg's islow IDCT and its integer fancy upsampler differ from our
    # exact-float versions by a few LSB; the corpus-wide envelope measured
    # max<=3 except one file's handful of pixels at 8 (<=0.02%).
    assert d.max() <= 8, f"max diff {d.max()}"
    assert (d > 3).mean() <= 0.001, f"frac>3 = {(d > 3).mean()}"
    assert d.mean() <= 1.5, f"mean diff {d.mean()}"


@pytest.mark.parametrize("path", WILD, ids=_ids(WILD))
def test_wild_file_backends_agree(path):
    data = open(path, "rb").read()
    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.models.decoder import _entropy_decode

    s = parse(data)
    ref_planes, _ = _entropy_decode(
        s, DecodeConfig(entropy_backend=EntropyBackend.NUMPY)
    )
    got_planes, _ = _entropy_decode(
        s, DecodeConfig(entropy_backend=EntropyBackend.NATIVE)
    )
    for ci in range(s.frame.ncs):
        np.testing.assert_array_equal(
            got_planes.plane(ci), ref_planes.plane(ci)
        )


@pytest.mark.parametrize(
    "path",
    [p for p in WILD if os.path.getsize(p) < 100_000],
    ids=_ids([p for p in WILD if os.path.getsize(p) < 100_000]),
)
def test_wild_file_oracle_agrees(path):
    """Bit-serial oracle cross-check on the smaller files (it is O(bits))."""
    data = open(path, "rb").read()
    from jpeg_decoder_tpu.core import oracle
    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.models.decoder import _entropy_decode

    s = parse(data)
    want = oracle.decode_structure(s).planes
    got_planes, qts = _entropy_decode(
        s, DecodeConfig(entropy_backend=EntropyBackend.NATIVE)
    )
    got = oracle.pixels_from_coeffs(s.frame, got_planes, qts)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow  # full-corpus device sweep; backends_agree keeps quick coverage
@pytest.mark.parametrize("path", WILD, ids=_ids(WILD))
def test_wild_file_host_fallback_matches_device(path):
    data = open(path, "rb").read()
    base = dict(
        quirks=Quirks.CORRECT,
        upsample="fancy",
        entropy_backend=EntropyBackend.NATIVE,
    )
    dev = decoder.decode(data, DecodeConfig(use_device=True, **base)).rgb
    host = decoder.decode(data, DecodeConfig(use_device=False, **base)).rgb
    np.testing.assert_array_equal(dev, host)
