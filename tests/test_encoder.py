"""Encoder tests: round-trip properties through our decoder and Pillow.

The reference encoder is non-functional (SURVEY.md §2), so the contracts
here are spec-level: streams parse, decode bit-consistently through the
coefficient IR, and reconstruct the input within quantization error.
"""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu.core import oracle
from jpeg_decoder_tpu.models import decoder, encoder
from jpeg_decoder_tpu.utils.config import DecodeConfig, EncodeConfig, EntropyBackend, Quirks

CFG_DEC = DecodeConfig(
    entropy_backend=EntropyBackend.ORACLE, quirks=Quirks.CORRECT
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else np.inf


def _smooth_rgb(h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(128, 40, (h // 8 + 2, w // 8 + 2, 3))
    img = np.array(
        Image.fromarray(
            np.clip(base, 0, 255).astype(np.uint8), "RGB"
        ).resize((w, h), Image.BILINEAR)
    )
    return img


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_roundtrip_our_decoder(sub):
    img = _smooth_rgb(64, 80)
    data = encoder.encode(img, EncodeConfig(quality=90, subsampling=sub))
    out = decoder.decode(data, CFG_DEC).rgb
    assert out.shape == img.shape
    assert _psnr(out, img) > (33 if sub == "420" else 35)


def test_roundtrip_pillow_decodes_it():
    img = _smooth_rgb(56, 72)
    data = encoder.encode(img, EncodeConfig(quality=92, subsampling="444"))
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert pil.shape == img.shape
    assert _psnr(pil, img) > 35


def test_roundtrip_gray():
    rng = np.random.default_rng(5)
    img = rng.integers(100, 156, (41, 57), dtype=np.uint8)
    data = encoder.encode(img, EncodeConfig(quality=95, subsampling="gray"))
    out = decoder.decode(data, CFG_DEC)
    assert out.rgb.shape == (41, 57, 3)
    assert _psnr(out.rgb[..., 0], img) > 30
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    assert _psnr(pil, img) > 30


def test_restart_markers_roundtrip():
    img = _smooth_rgb(64, 64, seed=9)
    plain = encoder.encode(img, EncodeConfig(quality=85, subsampling="420"))
    with_rst = encoder.encode(
        img, EncodeConfig(quality=85, subsampling="420", restart_interval=2)
    )
    a = decoder.decode(plain, CFG_DEC).rgb
    b = decoder.decode(with_rst, CFG_DEC).rgb
    # Restart markers change framing only, not decoded pixels.
    np.testing.assert_array_equal(a, b)
    # Pillow agrees on the restart stream too.
    pil = np.asarray(Image.open(io.BytesIO(with_rst)).convert("RGB"))
    np.testing.assert_array_equal(pil.shape, a.shape)


def test_optimized_huffman_smaller_and_equal():
    img = _smooth_rgb(96, 96, seed=21)
    annex = encoder.encode(img, EncodeConfig(quality=85, huffman="annex_k"))
    opt = encoder.encode(img, EncodeConfig(quality=85, huffman="optimized"))
    assert len(opt) < len(annex)
    a = decoder.decode(annex, CFG_DEC).rgb
    b = decoder.decode(opt, CFG_DEC).rgb
    # Same coefficients, different entropy coding -> identical pixels.
    np.testing.assert_array_equal(a, b)


def test_coefficient_exact_roundtrip():
    """Entropy coding is lossless: encode -> entropy-decode returns the
    exact quantized coefficients the device FDCT produced."""
    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.core.types import CoefficientPlanes

    img = _smooth_rgb(48, 48, seed=33)
    cfg = EncodeConfig(quality=80, subsampling="420")
    data = encoder.encode(img, cfg)
    s = parse(data)
    planes = CoefficientPlanes(s.frame)
    oracle.decode_sequential_scan(s, s.scans[0], planes)

    # Recompute what the encoder's device stage emitted.
    import jax.numpy as jnp

    qt_l, qt_c = encoder.quality_qtables(cfg.quality)
    stage, factors, (mx, my) = encoder._build_device_stage(
        48, 48, "420", (qt_l.tobytes(), qt_c.tobytes()), False
    )
    want = [np.asarray(c) for c in stage(jnp.asarray(img))]
    for ci in range(3):
        np.testing.assert_array_equal(planes.plane(ci), want[ci])


def test_quality_ladder_monotone_size():
    img = _smooth_rgb(64, 64, seed=4)
    sizes = [
        len(encoder.encode(img, EncodeConfig(quality=q))) for q in (10, 50, 90)
    ]
    assert sizes[0] < sizes[1] < sizes[2]


def test_encode_odd_dimensions():
    img = _smooth_rgb(33, 47, seed=8)
    data = encoder.encode(img, EncodeConfig(quality=90, subsampling="420"))
    out = decoder.decode(data, CFG_DEC).rgb
    assert out.shape == (33, 47, 3)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert pil.shape == (33, 47, 3)


def test_native_packer_byte_identical_to_python():
    from jpeg_decoder_tpu.native import runtime as nr
    from jpeg_decoder_tpu.core import entropy_encode, huffman

    if not nr.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(77)
    n = 24  # 4 MCUs x 6 units (420 layout)
    blocks = np.zeros((n, 64), dtype=np.int32)
    blocks[:, 0] = rng.integers(-800, 800, n)
    for i in range(n):
        pos = rng.choice(np.arange(1, 64), 12, replace=False)
        blocks[i, pos] = rng.integers(-300, 300, 12)
    unit_sci = [0, 0, 0, 0, 1, 2]
    table_of_unit = [(0, 0)] * 4 + [(1, 1)] * 2
    dc_specs = [huffman.annex_k_dc_luminance(), huffman.annex_k_dc_chrominance()]
    ac_specs = [huffman.annex_k_ac_luminance(), huffman.annex_k_ac_chrominance()]
    dc_t = [huffman.build_encode_table(s) for s in dc_specs]
    ac_t = [huffman.build_encode_table(s) for s in ac_specs]
    mcu_blocks = [(unit_sci[i % 6], blocks[i]) for i in range(n)]
    for ri in (0, 2):
        want = entropy_encode.encode_blocks(
            mcu_blocks, dc_t, ac_t, table_of_unit, 6, ri
        )
        got = nr.encode_scan_native(
            blocks,
            np.asarray(unit_sci, dtype=np.int32),
            np.asarray([t[0] for t in table_of_unit], dtype=np.int32),
            np.asarray([t[1] for t in table_of_unit], dtype=np.int32),
            dc_t, ac_t, ri,
        )
        assert got == want, f"ri={ri}: native pack differs"


# ---------------------------------------------------------------------------
# Plane-direct native path (the MCU interleave addressed in the C++ walk)
# ---------------------------------------------------------------------------


def _plane_fixture(sub, h, w, seed=21):
    """Device-stage coefficient planes + layout for a given subsampling."""
    import jax.numpy as jnp

    img = _smooth_rgb(h, w, seed=seed)
    qt_l, qt_c = encoder.quality_qtables(75)
    stage, factors, (mx, my) = encoder._build_device_stage(
        h, w, sub, (qt_l.tobytes(), qt_c.tobytes()), False
    )
    coeffs = [np.asarray(c) for c in stage(jnp.asarray(img))]
    return coeffs, factors, mx, my


@pytest.mark.parametrize("sub", ["444", "420", "411", "mixed"])
@pytest.mark.parametrize("ri", [0, 3])
def test_plane_packer_byte_identical(sub, ri):
    """encode_scan_planes (plane-direct, int16) == the Python packer on the
    materialized MCU-interleaved layout, byte for byte."""
    from jpeg_decoder_tpu.core import entropy_encode, huffman
    from jpeg_decoder_tpu.native import runtime as nr

    if not nr.available():
        pytest.skip("native runtime unavailable")
    coeffs, factors, mx, my = _plane_fixture(sub, 40, 56)
    n_tables = 2
    mcu_blocks, table_of_unit, upm = encoder.JpegEncoder._fallback_order(
        coeffs, factors, mx, my, n_tables
    )
    dc_specs = [huffman.annex_k_dc_luminance(), huffman.annex_k_dc_chrominance()]
    ac_specs = [huffman.annex_k_ac_luminance(), huffman.annex_k_ac_chrominance()]
    dc_t = [huffman.build_encode_table(s) for s in dc_specs]
    ac_t = [huffman.build_encode_table(s) for s in ac_specs]
    want = entropy_encode.encode_blocks(
        mcu_blocks, dc_t, ac_t, table_of_unit, upm, ri
    )
    unit_params, _ = encoder._unit_layout(factors, n_tables)
    got = nr.encode_scan_planes(
        coeffs, mx, mx * my, unit_params, dc_t, ac_t, ri
    )
    assert got == want, f"{sub} ri={ri}: plane-direct pack differs"


@pytest.mark.parametrize("sub", ["420", "mixed"])
def test_native_count_matches_python(sub):
    """jdt_count_scan_planes == core.entropy_encode.count_symbols."""
    from jpeg_decoder_tpu.core import entropy_encode
    from jpeg_decoder_tpu.native import runtime as nr

    if not nr.available():
        pytest.skip("native runtime unavailable")
    coeffs, factors, mx, my = _plane_fixture(sub, 48, 48, seed=9)
    n_tables = 2
    mcu_blocks, table_of_unit, upm = encoder.JpegEncoder._fallback_order(
        coeffs, factors, mx, my, n_tables
    )
    for ri in (0, 2):
        want_dc, want_ac = entropy_encode.count_symbols(
            mcu_blocks, n_tables, n_tables, table_of_unit, upm, ri
        )
        unit_params, _ = encoder._unit_layout(factors, n_tables)
        got_dc, got_ac = nr.count_scan_planes(
            coeffs, mx, mx * my, unit_params, n_tables, n_tables, ri
        )
        for t in range(n_tables):
            np.testing.assert_array_equal(got_dc[t], want_dc[t])
            np.testing.assert_array_equal(got_ac[t], want_ac[t])


def test_plane_packer_rejects_bad_unit_params():
    """Malformed unit descriptors / undersized planes must fail with a
    typed error (status 2), never an out-of-bounds read."""
    from jpeg_decoder_tpu.core import huffman
    from jpeg_decoder_tpu.native import runtime as nr

    if not nr.available():
        pytest.skip("native runtime unavailable")
    coeffs, factors, mx, my = _plane_fixture("420", 32, 32)
    dc_t = [huffman.build_encode_table(huffman.annex_k_dc_luminance())]
    ac_t = [huffman.build_encode_table(huffman.annex_k_ac_luminance())]
    good, _ = encoder._unit_layout(factors, 1)
    bad_cases = []
    b = good.copy(); b[0, 3] = b[0, 2]      # j >= fv
    bad_cases.append(b)
    b = good.copy(); b[0, 4] = b[0, 1]      # k >= fh
    bad_cases.append(b)
    b = good.copy(); b[0, 0] = 7            # comp out of range
    bad_cases.append(b)
    b = good.copy(); b[0, 6] = 5            # dc table out of range
    bad_cases.append(b)
    b = good.copy(); b[0, 1] = 9            # fh > 4
    bad_cases.append(b)
    for bad in bad_cases:
        with pytest.raises(ValueError):
            nr.encode_scan_planes(coeffs, mx, mx * my, bad, dc_t, ac_t, 0)
    # Undersized plane: luma claims (2,2) sampling but the plane is the
    # 1x1-sized chroma array.
    small = [coeffs[1], coeffs[1], coeffs[2]]
    with pytest.raises(ValueError):
        nr.encode_scan_planes(small, mx, mx * my, good, dc_t, ac_t, 0)


def test_optimized_tables_native_equals_fallback_stream():
    """Full optimized-mode encode must produce the same bytes whether the
    count+pack run natively or through the Python fallback."""
    from jpeg_decoder_tpu.native import runtime as nr

    if not nr.available():
        pytest.skip("native runtime unavailable")
    img = _smooth_rgb(40, 48, seed=14)
    cfg = EncodeConfig(quality=85, subsampling="420", huffman="optimized",
                       restart_interval=2)
    native = encoder.encode(img, cfg)

    # Force the Python fallback by monkeypatching availability.
    import jpeg_decoder_tpu.native.runtime as runtime_mod

    orig = runtime_mod.available
    runtime_mod.available = lambda: False
    try:
        fallback = encoder.encode(img, cfg)
    finally:
        runtime_mod.available = orig
    assert native == fallback


def test_encode_stream_matches_encode():
    imgs = [_smooth_rgb(40, 56, seed=s) for s in (1, 2, 3)]
    cfg = EncodeConfig(quality=88, subsampling="420", restart_interval=3)
    enc = encoder.JpegEncoder(cfg)
    streamed = list(enc.encode_stream(imgs))
    assert streamed == [enc.encode(im) for im in imgs]
    # Mixed geometry in one stream is allowed.
    mixed = [_smooth_rgb(24, 24, seed=7), _smooth_rgb(40, 32, seed=8)]
    assert list(enc.encode_stream(mixed)) == [enc.encode(im) for im in mixed]
    assert list(enc.encode_stream([])) == []
