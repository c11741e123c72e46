"""Checkpoint/resume of the coefficient-plane IR (SURVEY.md §5)."""

import numpy as np
import pytest

from jpeg_decoder_tpu.core import checkpoint, oracle
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend
from jpeg_decoder_tpu.utils.errors import JpegError

from . import corpus

CFG = DecodeConfig(entropy_backend=EntropyBackend.NUMPY)


def test_scan_decoder_matches_oracle():
    name, data = corpus.progressive_corpus()[2]  # prog_420, multi-scan
    s = parse(data)
    d = checkpoint.ScanDecoder(s, CFG)
    assert d.total_scans > 2
    while not d.finished:
        d.step()
    got = d.finish()
    want = oracle.decode(data)
    np.testing.assert_array_equal(got.rgb, want.rgb)


def test_checkpoint_roundtrip_mid_stream(tmp_path):
    name, data = corpus.progressive_corpus()[1]  # prog_444
    s = parse(data)
    d = checkpoint.ScanDecoder(s, CFG)
    d.step()
    d.step()
    ck = tmp_path / "mid.npz"
    d.checkpoint(ck)

    # Resume in a "new process": fresh structure parse, restore, finish.
    s2 = parse(data)
    d2 = checkpoint.ScanDecoder.restore(ck, s2, CFG)
    assert d2.scans_done == 2
    while not d2.finished:
        d2.step()
    got = d2.finish()
    want = oracle.decode(data)
    np.testing.assert_array_equal(got.rgb, want.rgb)


def test_partial_progressive_renders():
    """Finishing early gives a valid (lower-quality) image — the
    progressive preview property."""
    name, data = corpus.progressive_corpus()[2]
    s = parse(data)
    d = checkpoint.ScanDecoder(s, CFG)
    d.step()  # DC scan only
    img = d.finish()
    assert img.rgb.shape == (80, 96, 3)
    full = oracle.decode(data).rgb
    # Same scene, reduced fidelity: correlated but not equal.
    assert not np.array_equal(img.rgb, full)
    assert np.abs(img.rgb.astype(int) - full.astype(int)).mean() < 30


def test_corrupt_checkpoint_rejected(tmp_path):
    name, data = corpus.baseline_corpus()[0]
    s = parse(data)
    d = checkpoint.ScanDecoder(s, CFG)
    d.step()
    ck = tmp_path / "c.npz"
    d.checkpoint(ck)
    raw = bytearray(ck.read_bytes())
    raw[len(raw) // 2] ^= 0xFF
    ck.write_bytes(bytes(raw))
    with pytest.raises(Exception):  # digest mismatch or zip corruption
        checkpoint.ScanDecoder.restore(ck, parse(data), CFG)


def test_geometry_mismatch_rejected(tmp_path):
    a = corpus.baseline_corpus()[0][1]
    b = corpus.baseline_corpus()[3][1]
    s = parse(a)
    d = checkpoint.ScanDecoder(s, CFG)
    d.step()
    ck = tmp_path / "c.npz"
    d.checkpoint(ck)
    with pytest.raises(JpegError):
        checkpoint.ScanDecoder.restore(ck, parse(b), CFG)


def test_step_past_end_raises():
    name, data = corpus.baseline_corpus()[0]
    d = checkpoint.ScanDecoder(parse(data), CFG)
    d.step()
    with pytest.raises(JpegError):
        d.step()
