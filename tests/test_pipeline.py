"""End-to-end pipeline tests: full decode (device stage) vs the oracle.

The oracle is reference-parity-validated (test_reference_parity.py), so
bitwise agreement here chains all the way to the compiled C decoder.
"""

import numpy as np
import pytest

from jpeg_decoder_tpu.core import oracle
from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.utils.config import (
    DecodeConfig,
    EntropyBackend,
    IdctPrecision,
    Quirks,
)

from . import corpus


ORACLE_CFG = DecodeConfig(entropy_backend=EntropyBackend.ORACLE)


@pytest.mark.parametrize("name,data", corpus.baseline_corpus(), ids=lambda v: v if isinstance(v, str) else "")
def test_device_pipeline_bitwise_vs_oracle(name, data):
    want = oracle.decode(data)
    got = decoder.decode(data, ORACLE_CFG)
    assert got.rgb.shape == want.rgb.shape
    np.testing.assert_array_equal(got.rgb, want.rgb)
    for gp, wp in zip(got.planes, want.planes):
        np.testing.assert_array_equal(gp, wp)


@pytest.mark.parametrize(
    "name,data", corpus.progressive_corpus(), ids=lambda v: v if isinstance(v, str) else ""
)
def test_device_pipeline_progressive(name, data):
    want = oracle.decode(data)
    got = decoder.decode(data, ORACLE_CFG)
    np.testing.assert_array_equal(got.rgb, want.rgb)


def test_float32_mode_within_1lsb():
    name, data = corpus.baseline_corpus()[3]  # rgb444_q90
    want = oracle.decode(data).rgb.astype(np.int32)
    cfg = ORACLE_CFG.replace(idct_precision=IdctPrecision.FLOAT32)
    got = decoder.decode(data, cfg).rgb.astype(np.int32)
    assert np.abs(got - want).max() <= 1


def test_correct_quirks_mode_runs():
    # CORRECT mode fixes the reference's quirks; sanity: close to REFERENCE.
    name, data = corpus.baseline_corpus()[0]  # gray_64_q85
    cfg = ORACLE_CFG.replace(quirks=Quirks.CORRECT)
    got = decoder.decode(data, cfg)
    want = oracle.decode(data)
    assert np.abs(got.rgb.astype(int) - want.rgb.astype(int)).max() <= 1


def test_host_only_mode_matches_device():
    name, data = corpus.baseline_corpus()[6]  # rgb420_odd_q85
    dev = decoder.decode(data, ORACLE_CFG)
    host = decoder.decode(data, ORACLE_CFG.replace(use_device=False))
    np.testing.assert_array_equal(dev.rgb, host.rgb)


def test_decoder_class_and_stage_cache():
    d = decoder.JpegDecoder(ORACLE_CFG)
    name, data = corpus.baseline_corpus()[0]
    a = d.decode(data)
    b = d.decode(data)
    np.testing.assert_array_equal(a.rgb, b.rgb)
    # Same geometry + tables -> same cached jitted stage.
    s = d.parse(data)
    qts = {tid: qt.values for sc in s.scans for tid, qt in sc.quant_tables.items()}
    st1 = decoder.device_stage_for(s.frame, qts, ORACLE_CFG)
    st2 = decoder.device_stage_for(s.frame, qts, ORACLE_CFG)
    assert st1 is st2


@pytest.mark.parametrize(
    "name,data",
    corpus.baseline_corpus()[:6] + corpus.progressive_corpus()[:2],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_numpy_backend_matches_oracle(name, data):
    cfg = ORACLE_CFG.replace(entropy_backend=EntropyBackend.NUMPY)
    want = oracle.decode(data)
    got = decoder.decode(data, cfg)
    np.testing.assert_array_equal(got.rgb, want.rgb)


def test_host_decode_stream_matches_host_decode():
    """The pipelined host stage (prepare k+1 under native decode k) must
    yield exactly what per-image host_decode returns, in order, including
    the classic-path fallbacks (progressive, multi-scan)."""
    cfg = DecodeConfig()
    inputs = [d for _n, d in corpus.baseline_corpus()[:4]]
    inputs += [d for _n, d, _r in corpus.dri_corpus()[:2]]
    inputs += [d for _n, d in corpus.progressive_corpus()[:2]]
    # Interleave so fused-path and fallback images alternate.
    inputs = inputs[::2] + inputs[1::2]

    got = list(decoder.host_decode_stream(inputs, cfg))
    assert len(got) == len(inputs)
    for data, (frame, planes, qts) in zip(inputs, got):
        w_frame, w_planes, w_qts = decoder.host_decode(data, cfg)
        assert frame == w_frame
        assert set(qts) == set(w_qts)
        for k in qts:
            np.testing.assert_array_equal(qts[k], w_qts[k])
        for ci in range(frame.ncs):
            np.testing.assert_array_equal(
                planes.plane(ci), w_planes.plane(ci)
            )


def test_host_decode_stream_pool_reuse():
    """Streaming with a PlanePool must not cross-contaminate images."""
    cfg = DecodeConfig()
    pool = decoder.PlanePool()
    datas = [d for _n, d in corpus.baseline_corpus()[:2]] * 3
    outs = []
    for frame, planes, qts in decoder.host_decode_stream(datas, cfg, pool):
        # Copy out, then release — the serving pattern.
        outs.append([planes.plane(ci).copy() for ci in range(frame.ncs)])
        pool.release(planes)
    for i, data in enumerate(datas):
        _f, w_planes, _q = decoder.host_decode(data, cfg)
        for ci, got in enumerate(outs[i]):
            np.testing.assert_array_equal(got, w_planes.plane(ci))


def test_host_decode_batch():
    """Cross-image concurrent host stage == per-image host_decode, in input
    order, over a mix of fused-path (sequential DRI), speculative (no-DRI),
    and classic-fallback (progressive) images, with a shared PlanePool."""
    cfg = DecodeConfig()
    pool = decoder.PlanePool()
    inputs = [d for _n, d in corpus.baseline_corpus()[:4]]
    inputs += [d for _n, d, _r in corpus.dri_corpus()[:2]]
    inputs += [d for _n, d in corpus.progressive_corpus()[:2]]
    inputs = inputs[::2] + inputs[1::2]

    outs = []
    for frame, planes, qts in decoder.host_decode_batch(
        inputs, cfg, pool, max_workers=3
    ):
        outs.append(
            (frame, [planes.plane(ci).copy() for ci in range(frame.ncs)],
             {k: v.copy() for k, v in qts.items()})
        )
        pool.release(planes)
    assert len(outs) == len(inputs)
    for data, (frame, plane_copies, qts) in zip(inputs, outs):
        w_frame, w_planes, w_qts = decoder.host_decode(data, cfg)
        assert frame == w_frame
        assert set(qts) == set(w_qts)
        for k in qts:
            np.testing.assert_array_equal(qts[k], w_qts[k])
        for ci, got in enumerate(plane_copies):
            np.testing.assert_array_equal(got, w_planes.plane(ci))


def test_host_decode_batch_error_order():
    """The FIRST-in-order failing image's error surfaces at its yield
    position; earlier images still come out intact."""
    from jpeg_decoder_tpu.utils.errors import JpegError

    cfg = DecodeConfig()
    good = [d for _n, d in corpus.baseline_corpus()[:2]]
    bad = b"\xff\xd8\xff\xdb\x00\x04\x00\x00"  # truncated DQT, no SOS
    gen = decoder.host_decode_batch(good + [bad] + good, cfg, max_workers=4)
    frame0, _p0, _q0 = next(gen)
    frame1, _p1, _q1 = next(gen)
    assert frame0.width and frame1.width
    with pytest.raises(JpegError):
        next(gen)


def test_host_decode_batch_empty():
    """An empty input stream yields nothing and raises nothing."""
    assert list(decoder.host_decode_batch([], DecodeConfig())) == []
