"""Native C++ runtime tests: segment-parallel entropy decode vs the oracle."""

import numpy as np
import pytest

from jpeg_decoder_tpu.core import oracle
from jpeg_decoder_tpu.core.types import CoefficientPlanes
from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.native import runtime as native_runtime
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend

from . import corpus

pytestmark = pytest.mark.skipif(
    not native_runtime.available(), reason="native runtime unavailable"
)

NATIVE_CFG = DecodeConfig(entropy_backend=EntropyBackend.NATIVE)


def _oracle_planes(data):
    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.io.markers import Encoding

    s = parse(data)
    planes = CoefficientPlanes(s.frame)
    for scan in s.scans:
        if s.frame.process == Encoding.PROGRESSIVE_DCT:
            oracle.decode_progressive_scan(s, scan, planes)
        else:
            oracle.decode_sequential_scan(s, scan, planes)
    return s, planes


@pytest.mark.parametrize(
    "name,data", corpus.baseline_corpus(), ids=lambda v: v if isinstance(v, str) else ""
)
def test_native_coefficients_match_oracle(name, data):
    s, want = _oracle_planes(data)
    got, _ = native_runtime.entropy_decode(s, NATIVE_CFG)
    for ci in range(s.frame.ncs):
        np.testing.assert_array_equal(got.plane(ci), want.plane(ci))


@pytest.mark.parametrize(
    "name,data", corpus.progressive_corpus(), ids=lambda v: v if isinstance(v, str) else ""
)
def test_native_progressive_match_oracle(name, data):
    s, want = _oracle_planes(data)
    got, _ = native_runtime.entropy_decode(s, NATIVE_CFG)
    for ci in range(s.frame.ncs):
        np.testing.assert_array_equal(got.plane(ci), want.plane(ci))


@pytest.mark.parametrize(
    "name,dri,plain", corpus.dri_corpus(), ids=lambda v: v if isinstance(v, str) else ""
)
def test_native_dri_segment_parallel(name, dri, plain):
    """Restart streams decode identically to plain streams (reference
    property, BASELINE.md), exercising the multi-segment parallel path."""
    img_dri = decoder.decode(dri, NATIVE_CFG)
    img_plain = decoder.decode(plain, NATIVE_CFG)
    np.testing.assert_array_equal(img_dri.rgb, img_plain.rgb)
    # And the parallel path agrees with the oracle segment-by-segment.
    s, want = _oracle_planes(dri)
    got, _ = native_runtime.entropy_decode(s, NATIVE_CFG)
    for ci in range(s.frame.ncs):
        np.testing.assert_array_equal(got.plane(ci), want.plane(ci))


def test_native_single_thread_matches_parallel():
    name, dri, plain = corpus.dri_corpus()[0]
    from jpeg_decoder_tpu.io.parser import parse

    s = parse(dri)
    got1, _ = native_runtime.entropy_decode(s, NATIVE_CFG.replace(num_threads=1))
    gotn, _ = native_runtime.entropy_decode(s, NATIVE_CFG.replace(num_threads=8))
    for ci in range(s.frame.ncs):
        np.testing.assert_array_equal(got1.plane(ci), gotn.plane(ci))


def test_native_full_pipeline_end_to_end():
    name, data = corpus.baseline_corpus()[6]  # rgb420_odd_q85
    want = oracle.decode(data)
    got = decoder.decode(data, NATIVE_CFG)
    np.testing.assert_array_equal(got.rgb, want.rgb)


def test_native_error_on_corrupt_stream():
    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.utils.errors import JpegEntropyError, JpegError

    name, data = corpus.baseline_corpus()[0]
    bad = bytearray(data)
    # Stomp the middle of the entropy data with an invalid-prefix pattern.
    s = parse(bytes(bad))
    span = s.scans[0].span
    mid = (span.start + span.end) // 2
    bad[mid : mid + 8] = b"\xff\x00" * 4  # long runs of 1s: likely bad code
    try:
        s2 = parse(bytes(bad))
        native_runtime.entropy_decode(s2, NATIVE_CFG)
    except JpegError:
        pass  # any structured error is acceptable; must not crash/exit


def test_native_scan_span_matches_numpy(rng):
    """The memchr-based span scan must classify identically to the NumPy
    reference on adversarial byte soups (stuffing, RSTn, fills, EOF FFs)."""
    from jpeg_decoder_tpu.io import bitstream as bs

    for trial in range(50):
        n = int(rng.integers(2, 4000))
        # Bias toward lots of 0xFF bytes to hit every classification arm.
        data = rng.choice(
            np.array([0xFF, 0x00, 0xD0, 0xD3, 0xD9, 0x11, 0x80], dtype=np.uint8),
            size=n,
            p=[0.3, 0.2, 0.1, 0.05, 0.05, 0.2, 0.1],
        )
        start = int(rng.integers(0, n - 1))
        native = native_runtime.scan_span(data, start)
        assert native is not None
        # NumPy reference body (bypass the native delegation).
        import unittest.mock as mock

        with mock.patch.object(bs, "_native_scan_span", lambda *a: None):
            want_end, want_rst, want_stuff = bs.scan_entropy_span(data, start)
        assert native[0] == want_end, f"trial {trial}: end differs"
        np.testing.assert_array_equal(native[1], want_rst)
        assert native[2] is not None
        np.testing.assert_array_equal(native[2], want_stuff)


def test_native_truncated_segments_agree_with_numpy(rng):
    """Truncation contract on the register-resident multi-stream path:
    a cut stream must surface as a structured JpegError or decode under
    the same <=7-alignment-bit tolerance as every other fast backend
    (FastBitReader.overran / BitReader::overran — the C reference's final
    byte may carry up to 7 pad bits) — never crash or silently diverge.
    Exercises the unclamped window loads (jdt_entropy.cpp reg_win):
    past-end reads land in the kRegPad zero pad and the du_done rule
    (bp > 8*len+7) must classify every cut point exactly like the NumPy
    backend. (The ORACLE is stricter by design: it raises on any read
    past the end, so a cut at a cheap final data unit can be oracle-error
    but fast-backend-ok.)"""
    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.utils.errors import JpegError

    np_cfg = DecodeConfig(entropy_backend=EntropyBackend.NUMPY)

    def run(data, cfg):
        try:
            s = parse(data)
        except JpegError:
            return "parse-error", None
        if cfg is np_cfg:
            from jpeg_decoder_tpu.core import entropy_np

            try:
                planes, _ = entropy_np.entropy_decode(s, cfg)
            except JpegError:
                return "error", None
            return "ok", planes
        try:
            planes, _ = native_runtime.entropy_decode(s, cfg)
        except JpegError:
            return "error", None
        return "ok", planes

    for name, dri, _plain in corpus.dri_corpus()[:3]:
        soi = bytes(dri)
        sos = soi.find(b"\xff\xda")
        assert sos > 0
        for frac in (0.3, 0.5, 0.7, 0.9, 0.99):
            cut = sos + 20 + int((len(soi) - sos - 20) * frac)
            bad = soi[:cut]
            got_status, got = run(bad, NATIVE_CFG)
            want_status, want = run(bad, np_cfg)
            assert got_status == want_status, (
                f"{name} cut@{frac}: native {got_status} vs numpy"
                f" {want_status}"
            )
            if got_status == "ok":
                s = parse(bad)
                for ci in range(s.frame.ncs):
                    np.testing.assert_array_equal(
                        got.plane(ci), want.plane(ci),
                        err_msg=f"{name} cut@{frac} comp {ci}",
                    )
