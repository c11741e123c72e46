"""Speculative self-synchronizing parallel decode of NO-restart streams.

The hard case SURVEY.md §3 identifies: without restart markers the bitstream
has no parallel seam. The native runtime's overlap-sync decoder must produce
bit-identical coefficients to the serial path on single-component scans.
"""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu.core import oracle
from jpeg_decoder_tpu.core.types import CoefficientPlanes
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.native import runtime as nr
from jpeg_decoder_tpu.utils.config import DecodeConfig

pytestmark = pytest.mark.skipif(
    not nr.available(), reason="native runtime unavailable"
)

CFG = DecodeConfig()


def _gray_jpeg(h, w, seed=0, quality=85):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def _spec_applies(data, cfg=CFG):
    s = parse(data, cfg)
    scan = s.scans[0]
    total_mcus, params, luts = nr.scan_layout(s, scan)
    planes = CoefficientPlanes(s.frame)
    used = nr._try_speculative(s, scan, planes, cfg, total_mcus, params, luts)
    return s, planes, used


def test_speculative_matches_serial_large_gray():
    data = _gray_jpeg(1024, 1024)  # ~16k blocks, no DRI
    s, planes, used = _spec_applies(data)
    assert used, "speculative path should engage on large no-DRI grayscale"
    serial, _ = nr.entropy_decode(s, CFG.replace(num_threads=1))
    np.testing.assert_array_equal(planes.plane(0), serial.plane(0))


@pytest.mark.parametrize("quality", [30, 95])
def test_speculative_quality_extremes(quality):
    data = _gray_jpeg(512, 1024, seed=3, quality=quality)
    s, planes, used = _spec_applies(data)
    if not used:
        pytest.skip("stream too small to chunk at this quality")
    serial, _ = nr.entropy_decode(s, CFG.replace(num_threads=1))
    np.testing.assert_array_equal(planes.plane(0), serial.plane(0))


def test_speculative_full_pipeline_vs_oracle():
    data = _gray_jpeg(768, 768, seed=9)
    want = oracle.decode(data)
    got = decoder.decode(data, CFG)
    np.testing.assert_array_equal(got.rgb, want.rgb)


def test_small_streams_skip_speculation():
    data = _gray_jpeg(64, 64, seed=1)
    s, planes, used = _spec_applies(data)
    assert not used  # under the MCU threshold


def _rgb_jpeg(h, w, seed=0, quality=85, subsampling=2):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(
        buf, "JPEG", quality=quality, subsampling=subsampling
    )
    return buf.getvalue()


@pytest.mark.parametrize("subsampling", [0, 1, 2], ids=["444", "422", "420"])
def test_speculative_interleaved_matches_serial(subsampling):
    """Interleaved no-DRI scans (the common camera/web shape): the sync key
    carries the unit-within-MCU phase, so multi-component scans decode
    chunk-parallel too — bit-identical to the serial path."""
    data = _rgb_jpeg(768, 1024, seed=5, subsampling=subsampling)
    s, planes, used = _spec_applies(data)
    assert used, "speculative path should engage on large no-DRI interleaved"
    serial, _ = nr.entropy_decode(s, CFG.replace(num_threads=1))
    for ci in range(s.frame.ncs):
        np.testing.assert_array_equal(planes.plane(ci), serial.plane(ci))


def test_speculative_interleaved_full_pipeline_vs_oracle():
    data = _rgb_jpeg(640, 896, seed=11)
    want = oracle.decode(data)
    got = decoder.decode(data, CFG)
    np.testing.assert_array_equal(got.rgb, want.rgb)


def test_speculative_interleaved_corruption_consistency():
    """Corrupt interleaved no-DRI streams: when both serial and speculative
    succeed they must agree; the phase-lattice check forces fallback on any
    stitch confusion."""
    data = _rgb_jpeg(512, 768, seed=21)
    rng = np.random.default_rng(17)
    s0 = parse(data)
    span = s0.scans[0].span
    for _ in range(10):
        bad = bytearray(data)
        pos = int(rng.integers(span.start, span.end))
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        bad = bytes(bad)
        try:
            serial, _ = nr.entropy_decode(parse(bad), CFG.replace(num_threads=1))
            serial_ok = True
        except Exception:
            serial_ok = False
        try:
            spec, _ = nr.entropy_decode(parse(bad), CFG)
            spec_ok = True
        except Exception:
            spec_ok = False
        if serial_ok and spec_ok:
            for ci in range(parse(bad).frame.ncs):
                np.testing.assert_array_equal(
                    spec.plane(ci), serial.plane(ci)
                )


def test_speculative_single_thread_config_skips():
    data = _gray_jpeg(1024, 1024, seed=2)
    s, planes, used = _spec_applies(data, CFG.replace(num_threads=1))
    assert not used


def test_speculative_corruption_never_crashes():
    """Corrupted large no-DRI streams: the speculative path must either
    produce the same structured error/fallback behavior as serial — never
    wrong silent output differing from the serial path's successful decode."""
    data = _gray_jpeg(768, 512, seed=77)
    rng = np.random.default_rng(13)
    s0 = parse(data)
    span = s0.scans[0].span
    for _ in range(15):
        bad = bytearray(data)
        pos = int(rng.integers(span.start, span.end))
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        bad = bytes(bad)
        try:
            serial, _ = nr.entropy_decode(parse(bad), CFG.replace(num_threads=1))
            serial_ok = True
        except Exception:
            serial_ok = False
        try:
            spec, _ = nr.entropy_decode(parse(bad), CFG)
            spec_ok = True
        except Exception:
            spec_ok = False
        if serial_ok and spec_ok:
            np.testing.assert_array_equal(spec.plane(0), serial.plane(0))


def test_multistream_matches_bitreader_engines():
    """The r3 multi-stream speculative engine vs the single-stream
    BitReader reference workers (JDT_SPEC_MODE=bitreader): identical
    planes on clean streams of several shapes, and agreement whenever
    both succeed on bit-flipped streams."""
    import os

    rng = np.random.default_rng(99)
    shapes = [((320, 1024), 0), ((512, 768), 2), ((256, 1280), 1)]
    datas = [
        _rgb_jpeg(h, w, seed=int(rng.integers(1 << 30)), subsampling=sub)
        for (h, w), sub in shapes
    ]
    for data in datas:
        os.environ["JDT_SPEC_MODE"] = "bitreader"
        try:
            a, _ = nr.entropy_decode(parse(data), CFG)
        finally:
            del os.environ["JDT_SPEC_MODE"]
        b, _ = nr.entropy_decode(parse(data), CFG)
        for ci in range(parse(data).frame.ncs):
            np.testing.assert_array_equal(b.plane(ci), a.plane(ci))

    # corruption agreement: same acceptance and same output when both ok
    data = datas[1]
    span = parse(data).scans[0].span
    for _ in range(12):
        bad = bytearray(data)
        pos = int(rng.integers(span.start, span.end))
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        bad = bytes(bad)

        def run(mode):
            if mode:
                os.environ["JDT_SPEC_MODE"] = mode
            try:
                return nr.entropy_decode(parse(bad), CFG)[0]
            except Exception:
                return None
            finally:
                os.environ.pop("JDT_SPEC_MODE", None)

        a = run("bitreader")
        b = run(None)
        if a is not None and b is not None:
            for ci in range(parse(bad).frame.ncs):
                np.testing.assert_array_equal(b.plane(ci), a.plane(ci))
