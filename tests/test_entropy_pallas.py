"""Pallas lockstep entropy kernel vs the oracle (interpreter semantics on
the CPU test mesh; the compiled kernel is validated on hardware by the
bench/driver runs — same program, same lowering inputs)."""

import numpy as np
import pytest

from jpeg_decoder_tpu.core import oracle
from jpeg_decoder_tpu.core.types import CoefficientPlanes
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.ops import entropy_pallas
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend

from . import corpus

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

CFG = DecodeConfig(entropy_backend=EntropyBackend.PALLAS)


def _oracle_planes(data):
    s = parse(data)
    planes = CoefficientPlanes(s.frame)
    for scan in s.scans:
        oracle.decode_sequential_scan(s, scan, planes)
    return s, planes


@pytest.mark.parametrize(
    "name,data", corpus.baseline_corpus()[:6],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_pallas_matches_oracle(name, data):
    s, want = _oracle_planes(data)
    got, _ = entropy_pallas.entropy_decode(s, CFG)
    for ci in range(s.frame.ncs):
        np.testing.assert_array_equal(got.plane(ci), want.plane(ci))


@pytest.mark.parametrize(
    "name,dri,plain", corpus.dri_corpus(),
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_pallas_multilane(name, dri, plain):
    s, want = _oracle_planes(dri)
    assert s.scans[0].span.num_segments > 1
    got, _ = entropy_pallas.entropy_decode(s, CFG)
    for ci in range(s.frame.ncs):
        np.testing.assert_array_equal(got.plane(ci), want.plane(ci))


def test_pallas_multigroup():
    """>128 segments engage the interleaved lane-group path (G >= 2): one
    invocation decodes G*128 segments as independent latency-overlapped
    chains. 325 one-MCU segments -> G=3 with a partially-filled group."""
    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.utils.config import EncodeConfig

    rng = np.random.default_rng(77)
    arr = rng.integers(0, 256, (100, 200, 3), dtype=np.uint8)
    data = encoder.encode(
        arr, EncodeConfig(quality=90, subsampling="444", restart_interval=1)
    )
    s, want = _oracle_planes(data)
    assert s.scans[0].span.num_segments > 2 * entropy_pallas.LANES
    got, _ = entropy_pallas.entropy_decode(s, CFG)
    for ci in range(s.frame.ncs):
        np.testing.assert_array_equal(got.plane(ci), want.plane(ci))


def test_pallas_exotic_sampling():
    for name, data, _arr in corpus.exotic_sampling_corpus()[:3]:
        s, want = _oracle_planes(data)
        got, _ = entropy_pallas.entropy_decode(s, CFG)
        for ci in range(s.frame.ncs):
            np.testing.assert_array_equal(
                got.plane(ci), want.plane(ci), err_msg=name
            )


def test_pallas_full_pipeline():
    name, dri, plain = corpus.dri_corpus()[0]
    want = decoder.decode(
        dri, DecodeConfig(entropy_backend=EntropyBackend.ORACLE)
    ).rgb
    got = decoder.decode(dri, CFG).rgb
    np.testing.assert_array_equal(got, want)


def test_pallas_truncated_raises():
    from jpeg_decoder_tpu.utils.errors import JpegError, JpegTruncatedError

    name, data = corpus.baseline_corpus()[0]
    s = parse(data)
    span = s.scans[0].span
    cut = data[: span.start + (span.end - span.start) // 2]
    try:
        s2 = parse(cut)
    except JpegError:
        return
    with pytest.raises(JpegTruncatedError):
        entropy_pallas.entropy_decode(s2, CFG)


def test_pallas_corrupt_raises():
    from jpeg_decoder_tpu.utils.errors import JpegError

    name, data = corpus.baseline_corpus()[0]
    s = parse(data)
    span = s.scans[0].span
    bad = bytearray(data)
    for i in range(span.start + 8, min(span.start + 24, span.end)):
        bad[i] = 0xA5
    try:
        s2 = parse(bytes(bad))
    except JpegError:
        return
    try:
        got, _ = entropy_pallas.entropy_decode(s2, CFG)
        # decoding may "succeed" if the corruption forms valid codes; then
        # it must agree with the oracle's view of the same bytes
        _s, want = _oracle_planes(bytes(bad))
        for ci in range(s2.frame.ncs):
            np.testing.assert_array_equal(got.plane(ci), want.plane(ci))
    except JpegError:
        pass


def test_pallas_rejects_progressive():
    from jpeg_decoder_tpu.utils.errors import JpegUnsupportedError

    name, data = corpus.progressive_corpus()[0]
    s = parse(data)
    with pytest.raises(JpegUnsupportedError):
        entropy_pallas.entropy_decode(s, CFG)


def test_pallas_rejects_restart_free_large():
    """Restart-free streams have one lane and an R*64*128 output per MCU —
    the backend's contract is many short segments; big no-DRI streams are
    rejected up front (use the native backend)."""
    import io

    from PIL import Image
    from jpeg_decoder_tpu.utils.errors import JpegUnsupportedError

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, (256, 256), dtype=np.uint8)  # 1024 MCUs
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, "JPEG", quality=85)
    s = parse(buf.getvalue())
    with pytest.raises(JpegUnsupportedError):
        entropy_pallas.entropy_decode(s, CFG)


def test_pallas_batched_multi_image():
    """The batched serving path: segments from several images share one
    invocation's lanes (grouped by (ri, P, schedule, DHT content) — the
    compile/SMEM-uniform key). Mixed sizes form separate groups; every
    image must decode bit-identically to its oracle."""
    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.utils.config import EncodeConfig

    rng = np.random.default_rng(123)
    datas = []
    for i in range(3):  # same geometry/tables, different content+quality
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        datas.append(encoder.encode(
            arr,
            EncodeConfig(quality=85, subsampling="420", restart_interval=2),
        ))
    arr = rng.integers(0, 256, (32, 96, 3), dtype=np.uint8)  # second group
    datas.append(encoder.encode(
        arr, EncodeConfig(quality=85, subsampling="420", restart_interval=2)
    ))

    structures = [parse(d) for d in datas]
    results = entropy_pallas.entropy_decode_batch(structures, CFG)
    for d, s, (planes, _qts) in zip(datas, structures, results):
        _, want = _oracle_planes(d)
        for ci in range(s.frame.ncs):
            np.testing.assert_array_equal(planes.plane(ci), want.plane(ci))


def test_batchdecoder_pallas_serving_path():
    """The serving wire-up (VERDICT r3 item 3): BatchDecoder with
    EntropyBackend.PALLAS routes every batchable member of a stream
    through entropy_decode_batch (segments of ALL images share G=8
    invocations) and falls back per-image for members the lockstep kernel
    cannot hold. End-to-end decode_stream over 8 DRI images must be
    bit-identical to the oracle pipeline."""
    import jpeg_decoder_tpu as jt
    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.parallel.batch import BatchDecoder
    from jpeg_decoder_tpu.utils.config import (
        DecodeConfig, EncodeConfig, EntropyBackend,
    )

    rng = np.random.default_rng(7)
    datas = []
    for _ in range(8):
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        datas.append(encoder.encode(
            arr,
            EncodeConfig(quality=85, subsampling="420", restart_interval=2),
        ))
    cfg = DecodeConfig(entropy_backend=EntropyBackend.PALLAS)
    dec = BatchDecoder(cfg)
    got = np.concatenate(list(dec.decode_stream(datas, batch_size=4)))
    assert got.shape == (8, 48, 64, 3)
    for d, g in zip(datas, got):
        want = jt.decode_oracle(d).rgb
        np.testing.assert_array_equal(g, want)


def test_batchdecoder_pallas_mixed_fallback():
    """A batch mixing DRI members (device-batchable) with a restart-free
    member (not batchable) must still decode every image correctly: the
    restart-free one takes the native host fallback inside the same
    batch."""
    import jpeg_decoder_tpu as jt
    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.parallel.batch import BatchDecoder
    from jpeg_decoder_tpu.utils.config import (
        DecodeConfig, EncodeConfig, EntropyBackend,
    )
    from jpeg_decoder_tpu.ops import entropy_pallas
    from jpeg_decoder_tpu.io.parser import parse as parse_structure

    rng = np.random.default_rng(11)
    # 128x1024 4:2:0 = 8x64 = 512 MCUs: a restart-free member exceeds the
    # lockstep kernel's 256-MCU single-lane bound and must fall back.
    arrs = [rng.integers(0, 256, (128, 1024, 3), dtype=np.uint8)
            for _ in range(3)]
    datas = [
        encoder.encode(arrs[0], EncodeConfig(
            quality=85, subsampling="420", restart_interval=2)),
        # restart-free, > 256 MCUs: rejected by the lockstep kernel
        encoder.encode(arrs[1], EncodeConfig(
            quality=85, subsampling="420")),
        encoder.encode(arrs[2], EncodeConfig(
            quality=85, subsampling="420", restart_interval=2)),
    ]
    flags = [entropy_pallas.batchable(parse_structure(d)) for d in datas]
    assert flags == [True, False, True]
    cfg = DecodeConfig(entropy_backend=EntropyBackend.PALLAS)
    got = BatchDecoder(cfg).decode_batch(datas)
    for d, g in zip(datas, got):
        want = jt.decode_oracle(d).rgb
        np.testing.assert_array_equal(g, want)
