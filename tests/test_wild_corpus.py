"""Real-world-shaped conformance: exotic sampling factors, marker clutter,
multi-scan sequential files, DHT redefinition between scans.

The three common samplings (444/422/420) never exercise the general
per-component block wrap math (oracle._block_position / native UnitLayout
/ the device backend's block_base); 4:1:1, 4:4:0 and mixed chroma factors
do. Camera/web JPEGs also carry EXIF APP1 + Adobe APP14 clutter and may
use several sequential scans with table redefinition — legal shapes the
Pillow-generated corpus never produces (spec B.2.3/B.2.4).
"""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu.core import oracle
from jpeg_decoder_tpu.core.types import CoefficientPlanes
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend

from . import corpus

ORACLE = DecodeConfig(entropy_backend=EntropyBackend.ORACLE, use_device=False)
NUMPY = DecodeConfig(entropy_backend=EntropyBackend.NUMPY, use_device=False)
NATIVE = DecodeConfig(entropy_backend=EntropyBackend.NATIVE, use_device=False)


@pytest.fixture(scope="module")
def exotic():
    return corpus.exotic_sampling_corpus()


def test_exotic_sampling_backends_agree(exotic):
    for name, data, _arr in exotic:
        want = decoder.decode(data, ORACLE)
        for cfg in (NUMPY, NATIVE):
            got = decoder.decode(data, cfg)
            np.testing.assert_array_equal(
                got.rgb, want.rgb, err_msg=f"{name} {cfg.entropy_backend}"
            )


def test_exotic_sampling_device_pipeline(exotic):
    name, data, _arr = exotic[0]
    want = decoder.decode(data, ORACLE).rgb
    got = decoder.decode(data, DecodeConfig()).rgb
    np.testing.assert_array_equal(got, want, err_msg=name)


def test_exotic_sampling_device_entropy_backend(exotic):
    """The lockstep device lanes must handle non-uniform unit layouts."""
    from jpeg_decoder_tpu.ops import entropy_device

    for name, data, _arr in exotic[:3]:
        s = parse(data)
        want = CoefficientPlanes(s.frame)
        for scan in s.scans:
            oracle.decode_sequential_scan(s, scan, want)
        got, _ = entropy_device.entropy_decode(
            s, DecodeConfig(entropy_backend=EntropyBackend.DEVICE)
        )
        for ci in range(s.frame.ncs):
            np.testing.assert_array_equal(
                got.plane(ci), want.plane(ci), err_msg=f"{name} comp{ci}"
            )


def test_exotic_sampling_pillow_differential(exotic):
    """libjpeg decodes 4:1:1 / 4:4:0; with CONSTANT chroma the upsampling
    rule cancels out, so our decode must sit within the IDCT rounding band
    of Pillow's (SURVEY.md: constant-chroma differential <= ~3 LSB)."""
    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.utils.config import EncodeConfig

    rng = np.random.default_rng(123)
    luma = rng.integers(0, 256, (48, 72), dtype=np.uint8)
    arr = np.stack([luma, luma, luma], axis=-1)  # gray content: chroma 128
    for sub in ("411", "440", "mixed"):
        data = encoder.encode(arr, EncodeConfig(quality=92, subsampling=sub))
        ours = decoder.decode(data, NATIVE).rgb
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        diff = np.abs(ours.astype(int) - pil.astype(int)).max()
        assert diff <= 3, f"{sub}: max diff {diff} vs Pillow"


def test_wild_markers_do_not_change_pixels():
    for name, data in corpus.baseline_corpus()[:4]:
        wild = corpus.with_wild_markers(data)
        want = decoder.decode(data, NATIVE).rgb
        got = decoder.decode(wild, NATIVE).rgb
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_wild_markers_recorded():
    name, data = corpus.baseline_corpus()[0]
    s = parse(corpus.with_wild_markers(data))
    markers = [m for m, _off, _payload in s.app_segments]
    assert 0xE1 in markers  # Exif APP1
    assert 0xEE in markers  # Adobe APP14
    payloads = {m: p for m, _off, p in s.app_segments}
    assert payloads[0xE1].startswith(b"Exif\x00\x00")
    assert payloads[0xEE].startswith(b"Adobe")


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("redefine", [False, True], ids=["shared", "redef"])
def test_multiscan_sequential(subsampling, redefine):
    """Non-interleaved multi-scan sequential streams must decode to the
    SAME pixels as the single interleaved scan of the same coefficients,
    on every backend — including per-scan DHT snapshots when table id 0 is
    redefined between scans."""
    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.utils.config import EncodeConfig

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (41, 57, 3), dtype=np.uint8)
    multi = corpus.multiscan_sequential(
        arr, quality=88, subsampling=subsampling, redefine_dht=redefine
    )
    single = encoder.encode(
        arr, EncodeConfig(quality=88, subsampling=subsampling)
    )
    s = parse(multi)
    assert len(s.scans) == 3
    want = decoder.decode(single, ORACLE).rgb
    for cfg in (ORACLE, NUMPY, NATIVE):
        got = decoder.decode(multi, cfg)
        np.testing.assert_array_equal(
            got.rgb, want, err_msg=str(cfg.entropy_backend)
        )


def test_multiscan_sequential_pillow_differential():
    """libjpeg accepts multi-scan sequential files; sanity-check ours
    against it (constant chroma -> tight band)."""
    rng = np.random.default_rng(11)
    luma = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    arr = np.stack([luma] * 3, axis=-1)
    multi = corpus.multiscan_sequential(arr, quality=92, subsampling="444")
    ours = decoder.decode(multi, NATIVE).rgb
    pil = np.asarray(Image.open(io.BytesIO(multi)).convert("RGB"))
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 3


def test_exotic_sampling_fuzz_consistency(exotic):
    """Bit flips in exotic-sampling entropy data: backends either raise a
    structured error or agree bit-for-bit — the wrap math must not place
    blocks differently under corruption."""
    from jpeg_decoder_tpu.utils.errors import JpegError

    name, data, _arr = exotic[2]  # mixed factors
    s0 = parse(data)
    span = s0.scans[0].span
    rng = np.random.default_rng(5)
    for _ in range(10):
        bad = bytearray(data)
        pos = int(rng.integers(span.start, span.end))
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        bad = bytes(bad)
        outs = {}
        for key, cfg in (("oracle", ORACLE), ("native", NATIVE)):
            try:
                outs[key] = decoder.decode(bad, cfg).rgb
            except JpegError:
                outs[key] = None
        if outs["oracle"] is not None and outs["native"] is not None:
            np.testing.assert_array_equal(outs["oracle"], outs["native"])
