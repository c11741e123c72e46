"""Differential tests for the fused host path (round 4).

The fused path (models/decoder._fast_host_decode) replaces
parse -> scan_span -> decode_scan_native with a cached header-prefix parse
plus ONE native call (jdt_scan_decode) that prescans and decodes in the
same invocation. It must be bit-identical to the classic path on every
stream it accepts, fall back (return None) on every stream it cannot
prove safe, and raise the same typed errors on malformed input.
"""

from __future__ import annotations

import numpy as np
import pytest

from jpeg_decoder_tpu.io import parser as parser_mod
from jpeg_decoder_tpu.io.parser import parse, parse_headers, parse_headers_cached
from jpeg_decoder_tpu.models import decoder as decoder_mod
from jpeg_decoder_tpu.native import runtime as native_runtime
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend
from jpeg_decoder_tpu.utils.errors import JpegEntropyError, JpegError

from .corpus import (
    baseline_corpus,
    dri_corpus,
    make_jpeg,
    multiscan_sequential,
    progressive_corpus,
    with_wild_markers,
)

pytestmark = pytest.mark.skipif(
    not native_runtime.available(), reason="native runtime unavailable"
)

CFG = DecodeConfig(use_device=False)


def _classic(data: bytes) -> np.ndarray:
    return decoder_mod.decode_structure(parse(data, CFG), CFG).rgb


def _fused_engaged(data: bytes) -> bool:
    arr = np.frombuffer(data, dtype=np.uint8)
    out = decoder_mod._fast_host_decode(arr, CFG)
    return out is not None


@pytest.mark.parametrize("name,data", baseline_corpus())
def test_fused_matches_classic_baseline(name, data):
    got = decoder_mod.decode(data, CFG).rgb
    assert np.array_equal(got, _classic(data)), name


def test_fused_engages_on_serving_shapes():
    # The fast path must actually run for the shapes it exists for —
    # single-scan sequential, with and without restart markers.
    for name, dri, plain in dri_corpus():
        assert _fused_engaged(dri), f"{name} (dri)"
        assert _fused_engaged(plain), f"{name} (plain)"


@pytest.mark.parametrize("name", [r[0] for r in dri_corpus()])
def test_fused_matches_classic_dri(name):
    row = dict((r[0], r) for r in dri_corpus())[name]
    _, dri, plain = row
    assert np.array_equal(decoder_mod.decode(dri, CFG).rgb, _classic(dri))
    assert np.array_equal(decoder_mod.decode(plain, CFG).rgb, _classic(plain))


def test_parse_headers_matches_parse():
    for name, data in baseline_corpus():
        hp = parse_headers(data, CFG)
        assert hp is not None, name
        s = parse(data, CFG)
        assert hp.frame == s.frame, name
        assert hp.entropy_start == s.scans[0].span.start, name
        assert hp.restart_interval == s.scans[0].restart_interval, name
        assert set(hp.quant_tables) == set(s.scans[0].quant_tables), name


def test_parse_headers_progressive_returns_none():
    for name, data in progressive_corpus():
        assert parse_headers(data, CFG) is None, name


def test_fused_falls_back_on_multiscan():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    data = multiscan_sequential(img)
    arr = np.frombuffer(data, dtype=np.uint8)
    # The tail walk sees the second SOS and refuses the fast path...
    assert decoder_mod._fast_host_decode(arr, CFG) is None
    # ...and the public decode still gets the right pixels via the
    # classic path.
    got = decoder_mod.decode(data, CFG).rgb
    assert np.array_equal(got, _classic(data))


def test_fused_with_wild_tail_markers():
    # APPn/COM before SOS and trailing junk after EOI must neither break
    # the fast path nor change output.
    _, data = baseline_corpus()[4]
    wild = with_wild_markers(data)
    assert np.array_equal(decoder_mod.decode(wild, CFG).rgb, _classic(wild))


def test_fused_truncated_raises_same_type():
    _, data = baseline_corpus()[6]  # rgb420_odd_q85
    cut = data[: int(len(data) * 0.6)]
    with pytest.raises(JpegError) as e1:
        decoder_mod.decode(cut, CFG)
    with pytest.raises(JpegError) as e2:
        decoder_mod.decode_structure(parse(cut, CFG), CFG)
    assert type(e1.value) is type(e2.value)


def test_fused_restart_mismatch_raises():
    # Corrupt the DRI interval of a restart-marked stream: the prescan's
    # segment count no longer matches ceil(total_mcus / ri).
    name, dri, _plain = dri_corpus()[0]
    i = dri.find(b"\xff\xdd")
    assert i >= 0
    ri = int.from_bytes(dri[i + 4 : i + 6], "big")
    bad = dri[: i + 4] + (ri + 1).to_bytes(2, "big") + dri[i + 6 :]
    with pytest.raises(JpegEntropyError):
        decoder_mod.decode(bad, CFG)
    with pytest.raises(JpegEntropyError):
        decoder_mod.decode_structure(parse(bad, CFG), CFG)


def test_header_prefix_cache_roundtrip():
    rng = np.random.default_rng(7)
    a = make_jpeg(rng.integers(0, 256, (64, 64, 3), np.uint8), "RGB",
                  quality=85, subsampling=2)
    b = make_jpeg(rng.integers(0, 256, (64, 64, 3), np.uint8), "RGB",
                  quality=85, subsampling=2)
    hp_a = parse_headers_cached(a, CFG)
    hp_b = parse_headers_cached(b, CFG)
    # Same encoder settings -> byte-identical header prefix -> shared entry.
    if a[: hp_a.entropy_start] == b[: hp_b.entropy_start]:
        assert hp_a is hp_b
    # Different quality -> different DQT bytes -> distinct entry.
    c = make_jpeg(rng.integers(0, 256, (64, 64, 3), np.uint8), "RGB",
                  quality=40, subsampling=2)
    hp_c = parse_headers_cached(c, CFG)
    assert hp_c is not hp_a
    # And the cached entry still decodes image b's payload correctly.
    assert np.array_equal(decoder_mod.decode(b, CFG).rgb, _classic(b))


def test_host_decode_matches_entropy_decode():
    pool = decoder_mod.PlanePool()
    for name, data in baseline_corpus()[:6]:
        frame, planes, qts = decoder_mod.host_decode(data, CFG, pool)
        s = parse(data, CFG)
        ref_planes, ref_qts = decoder_mod._entropy_decode(s, CFG)
        assert frame == s.frame, name
        for ci in range(frame.ncs):
            assert np.array_equal(planes.plane(ci), ref_planes.plane(ci)), name
        for tid in ref_qts:
            assert np.array_equal(qts[tid], ref_qts[tid]), name
        pool.release(planes)


def test_fused_numpy_backend_skips_fast_path():
    # Non-native backends must not be silently rerouted through the fused
    # native call.
    _, data = baseline_corpus()[0]
    arr = np.frombuffer(data, dtype=np.uint8)
    cfg = DecodeConfig(use_device=False, entropy_backend=EntropyBackend.NUMPY)
    assert decoder_mod._fast_host_decode(arr, cfg) is None
    got = decoder_mod.decode(data, cfg).rgb
    assert np.array_equal(got, _classic(data))
