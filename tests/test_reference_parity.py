"""Byte-exact conformance of the oracle against the COMPILED reference.

This is the ground-truth test: the reference C decoder (built from
/root/reference/src in the ref_harness fixture) and this engine's oracle must
produce identical component planes AND identical RGB output on the corpus.

Known reference defects encountered here (documented, not replicated):
  * the reference segfaults on some DRI streams (mishandled stuffed-0xFF at a
    restart boundary in next_byte_restart_marker, bitstream.c:142-176); those
    corpus entries fall back to a behavioral check (DRI output == non-DRI
    output of the same image);
  * the reference exits(1) on progressive files (decode.c:858-869), so
    progressive conformance is tested against Pillow/libjpeg in
    test_progressive.py instead.
"""

import numpy as np
import pytest

from jpeg_decoder_tpu.core.oracle import decode
from jpeg_decoder_tpu.utils.config import DecodeConfig, Quirks

from .conftest import run_reference
from .corpus import baseline_corpus, dri_corpus

CFG = DecodeConfig(quirks=Quirks.REFERENCE)


@pytest.mark.parametrize("name,data", baseline_corpus(), ids=lambda v: v if isinstance(v, str) else "")
def test_baseline_parity(name, data, ref_harness, tmp_path):
    ref = run_reference(ref_harness, data, tmp_path)
    assert ref is not None, f"reference crashed on {name}"
    ref_planes, ref_rgb = ref
    img = decode(data, CFG)
    assert len(ref_planes) == len(img.planes)
    for i, (a, b) in enumerate(zip(ref_planes, img.planes)):
        assert a.shape == b.shape, f"{name} plane {i} shape"
        assert np.array_equal(a, b), (
            f"{name} plane {i}: {np.count_nonzero(a != b)} bytes differ, "
            f"max {np.abs(a.astype(int) - b.astype(int)).max()}"
        )
    if ref_rgb is not None:
        assert np.array_equal(ref_rgb, img.rgb), (
            f"{name} rgb: {np.count_nonzero(ref_rgb != img.rgb)} bytes differ"
        )


@pytest.mark.parametrize(
    "name,dri,plain", dri_corpus(), ids=lambda v: v if isinstance(v, str) else ""
)
def test_dri_parity(name, dri, plain, ref_harness, tmp_path):
    """DRI streams: byte parity with the reference where it survives, and
    DRI-vs-plain behavioral equality always."""
    img_dri = decode(dri, CFG)
    img_plain = decode(plain, CFG)
    assert np.array_equal(img_dri.rgb, img_plain.rgb), (
        f"{name}: restart markers changed decoded output"
    )
    ref = run_reference(ref_harness, dri, tmp_path)
    if ref is None:
        pytest.xfail(f"reference decoder segfaults on {name} (known defect)")
    ref_planes, ref_rgb = ref
    for i, (a, b) in enumerate(zip(ref_planes, img_dri.planes)):
        assert np.array_equal(a, b), f"{name} plane {i} differs"
    if ref_rgb is not None:
        assert np.array_equal(ref_rgb, img_dri.rgb), f"{name} rgb differs"


@pytest.mark.parametrize(
    "name,data",
    baseline_corpus(),
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_full_pipeline_parity(name, data, ref_harness, tmp_path):
    """The PRODUCTION path (native segment-parallel entropy + device EXACT
    kernels) byte-equal to the compiled reference — direct, not transitive
    through the oracle."""
    from jpeg_decoder_tpu.models import decoder as decoder_mod
    from jpeg_decoder_tpu.utils.config import EntropyBackend, IdctPrecision

    ref = run_reference(ref_harness, data, tmp_path)
    assert ref is not None, f"reference crashed on {name}"
    ref_planes, ref_rgb = ref
    cfg = CFG.replace(
        entropy_backend=EntropyBackend.NATIVE,
        idct_precision=IdctPrecision.EXACT,
    )
    img = decoder_mod.decode(data, cfg)
    for i, (a, b) in enumerate(zip(ref_planes, img.planes)):
        assert np.array_equal(a, b), f"{name} plane {i} differs"
    if ref_rgb is not None:
        assert np.array_equal(ref_rgb, img.rgb), f"{name} rgb differs"
