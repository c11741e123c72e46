"""Progressive (SOF2) encoding round-trips — a capability the reference
lacks entirely on both sides."""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.models import decoder, encoder
from jpeg_decoder_tpu.utils.config import DecodeConfig, EncodeConfig, EntropyBackend

CFG = DecodeConfig(entropy_backend=EntropyBackend.NATIVE)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_progressive_encode_equals_baseline_pixels(sub, rng):
    """Same coefficients, different organization: our progressive and
    baseline encodings of one image must decode to identical pixels."""
    img = rng.integers(0, 256, (56, 72, 3), dtype=np.uint8)
    base = encoder.encode(img, EncodeConfig(quality=85, subsampling=sub))
    prog = encoder.encode(
        img, EncodeConfig(quality=85, subsampling=sub, progressive=True)
    )
    s = parse(prog)
    assert s.frame.process.name == "PROGRESSIVE_DCT"
    assert len(s.scans) == 4  # DC + 3 AC scans
    np.testing.assert_array_equal(
        decoder.decode(prog, CFG).rgb, decoder.decode(base, CFG).rgb
    )


def test_progressive_encode_pillow_decodes_identically(rng):
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    base = encoder.encode(img, EncodeConfig(quality=90, subsampling="444"))
    prog = encoder.encode(
        img, EncodeConfig(quality=90, subsampling="444", progressive=True)
    )
    a = np.asarray(Image.open(io.BytesIO(base)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(prog)).convert("RGB"))
    np.testing.assert_array_equal(a, b)


def test_progressive_encode_gray(rng):
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    prog = encoder.encode(
        img, EncodeConfig(quality=88, subsampling="gray", progressive=True)
    )
    s = parse(prog)
    assert len(s.scans) == 2
    ours = decoder.decode(prog, CFG).rgb[..., 0]
    pil = np.asarray(Image.open(io.BytesIO(prog)).convert("L"))
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_progressive_encode_coefficients_lossless(rng):
    """Entropy organization is lossless: progressive stream carries the
    exact quantized coefficients of the baseline stream."""
    from jpeg_decoder_tpu.models.decoder import _entropy_decode

    img = rng.integers(0, 256, (67, 45, 3), dtype=np.uint8)
    base = encoder.encode(img, EncodeConfig(quality=75, subsampling="420"))
    prog = encoder.encode(
        img, EncodeConfig(quality=75, subsampling="420", progressive=True)
    )
    sb, sp = parse(base), parse(prog)
    pb, _ = _entropy_decode(sb, CFG)
    pp, _ = _entropy_decode(sp, CFG)
    for ci, c in enumerate(sb.frame.components):
        # Progressive AC scans cover the component's own ceil(x/8) grid;
        # baseline fills the MCU-padded grid. Padding blocks are invisible
        # (cropped), so compare the visible grid.
        py, px = -(-c.y // 8), -(-c.x // 8)
        np.testing.assert_array_equal(
            pp.plane(ci)[:py, :px], pb.plane(ci)[:py, :px]
        )
    # Visible pixels are identical through the full pipeline.
    np.testing.assert_array_equal(
        decoder.decode(prog, CFG).rgb, decoder.decode(base, CFG).rgb
    )


def test_progressive_encode_smooth_image_smaller(rng):
    """On smooth content the EOB-run coding usually wins; sanity-check the
    stream is at least comparable in size (not a hard guarantee)."""
    from .test_encoder import _smooth_rgb

    img = _smooth_rgb(96, 96, seed=5)
    base = encoder.encode(img, EncodeConfig(quality=85, huffman="optimized"))
    prog = encoder.encode(img, EncodeConfig(quality=85, progressive=True))
    assert len(prog) < len(base) * 1.2
