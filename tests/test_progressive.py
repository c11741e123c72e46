"""Progressive conformance against external anchors.

The reference cannot serve as the progressive oracle (it exit(1)s,
decode.c:858-869), so the anchors are:
  * exactness: a progressive and a baseline encoding of the SAME source at
    the same quality carry identical quantized coefficients — our decoder
    must produce IDENTICAL pixels from both;
  * Pillow/libjpeg: tolerance cross-check on the decoded output (gray
    within 1, 4:4:4 within 4 — the same bounds as sequential, BASELINE.md).
"""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu.core.types import CoefficientPlanes
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend

from .corpus import make_jpeg

CFG = DecodeConfig(entropy_backend=EntropyBackend.NATIVE)


def _pair(arr, mode, **kw):
    prog = make_jpeg(arr, mode, progressive=True, **kw)
    base = make_jpeg(arr, mode, progressive=False, **kw)
    return prog, base


@pytest.mark.parametrize(
    "shape,mode,kw",
    [
        ((64, 48), "L", {}),
        ((64, 64, 3), "RGB", {"subsampling": 0}),
        ((67, 45, 3), "RGB", {"subsampling": 2}),
        ((64, 64, 3), "RGB", {"subsampling": 2, "quality": 25}),
    ],
    ids=["gray", "444", "420odd", "420q25"],
)
def test_progressive_equals_baseline_encoding(shape, mode, kw, rng):
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    kw.setdefault("quality", 85)
    prog, base = _pair(arr, mode, **kw)
    sp, sb = parse(prog), parse(base)
    assert sp.frame.process.name == "PROGRESSIVE_DCT"
    assert len(sp.scans) > 1

    # Coefficient-level equality: the strongest possible progressive check.
    from jpeg_decoder_tpu.models.decoder import _entropy_decode

    pp, _ = _entropy_decode(sp, CFG)
    pb, _ = _entropy_decode(sb, CFG)
    for ci in range(sp.frame.ncs):
        np.testing.assert_array_equal(pp.plane(ci), pb.plane(ci))

    # And pixel-level, through the full pipeline.
    np.testing.assert_array_equal(
        decoder.decode(prog, CFG).rgb, decoder.decode(base, CFG).rgb
    )


def test_progressive_gray_vs_pillow(rng):
    arr = rng.integers(0, 256, (56, 72), dtype=np.uint8)
    data = make_jpeg(arr, "L", progressive=True, quality=90)
    ours = decoder.decode(data, CFG).rgb[..., 0].astype(int)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("L")).astype(int)
    assert np.abs(ours - pil).max() <= 1


def test_progressive_444_vs_pillow(rng):
    arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    data = make_jpeg(arr, "RGB", progressive=True, quality=92, subsampling=0)
    ours = decoder.decode(data, CFG).rgb.astype(int)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(int)
    assert np.abs(ours - pil).max() <= 4


def test_progressive_with_restarts(rng):
    """Progressive + DRI: EOB runs and predictors reset per segment."""
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    data = make_jpeg(
        arr, "RGB", progressive=True, quality=85, subsampling=2,
        restart_marker_rows=1,
    )
    s = parse(data)
    assert any(sc.restart_interval for sc in s.scans)
    plain = make_jpeg(arr, "RGB", progressive=True, quality=85, subsampling=2)
    np.testing.assert_array_equal(
        decoder.decode(data, CFG).rgb, decoder.decode(plain, CFG).rgb
    )


def test_scan_deps_dag():
    """The out-of-order scan scheduler's dependency rule: scans are
    ordered iff they share a component AND their spectral bands overlap
    (core/driver.scan_deps) — the Pillow-style 10-scan script must yield
    independent chroma/DC chains under the luma critical path."""
    import types

    from jpeg_decoder_tpu.core.driver import scan_deps
    from jpeg_decoder_tpu.core.types import ScanComponent, ScanHeader

    def scan(comps, ss, se):
        h = ScanHeader(
            components=tuple(ScanComponent(sc=c, dc=0, ac=0) for c in comps),
            ss=ss, se=se, ah=0, al=0,
        )
        return types.SimpleNamespace(header=h)

    # The scan script of the bench's progressive input (Pillow q85 420).
    scans = [
        scan((1, 2, 3), 0, 0),   # 0 DC first
        scan((1,), 1, 5),        # 1 luma AC band 1-5
        scan((3,), 1, 63),       # 2 cr AC
        scan((2,), 1, 63),       # 3 cb AC
        scan((1,), 6, 63),       # 4 luma AC band 6-63
        scan((1,), 1, 63),       # 5 luma refine
        scan((1, 2, 3), 0, 0),   # 6 DC refine
        scan((3,), 1, 63),       # 7 cr refine
        scan((2,), 1, 63),       # 8 cb refine
        scan((1,), 1, 63),       # 9 luma refine
    ]
    deps = scan_deps(scans)
    assert deps == [
        [],        # DC first
        [],        # luma 1-5: disjoint band from DC
        [],        # cr independent
        [],        # cb independent
        [],        # luma 6-63: disjoint from luma 1-5
        [1, 4],    # luma refine needs both first passes
        [0],       # DC refine after DC first only
        [2],       # cr refine after cr first
        [3],       # cb refine after cb first
        [1, 4, 5],  # final luma refine: all earlier luma AC scans
    ]           # (scan_deps lists every overlapping predecessor, not
                # the transitive reduction — ordering is what matters)

    # Sequential multi-scan (full-band per component): strict per-
    # component chains, DC scan ordered against everything it shares.
    seq = [scan((1, 2, 3), 0, 63), scan((1,), 0, 63), scan((1,), 0, 63)]
    assert scan_deps(seq) == [[], [0], [0, 1]]
