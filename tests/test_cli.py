"""CLI surface tests (the reference's L7 layer, SURVEY.md §1)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from jpeg_decoder_tpu import cli

from . import corpus


@pytest.fixture(scope="module")
def sample_jpeg(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    p = d / "in.jpg"
    p.write_bytes(corpus.baseline_corpus()[5][1])  # rgb420_q90, 64x64
    return p


def test_decode_to_ppm(sample_jpeg, tmp_path):
    out = tmp_path / "out.ppm"
    rc = cli.main(["decode", str(sample_jpeg), str(out), "--backend", "numpy"])
    assert rc == 0
    raw = out.read_bytes()
    assert raw.startswith(b"P6\n64 64\n255\n")
    assert len(raw) == len(b"P6\n64 64\n255\n") + 64 * 64 * 3


def test_decode_to_png_matches_library(sample_jpeg, tmp_path):
    from PIL import Image

    from jpeg_decoder_tpu.models.decoder import decode
    from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend

    out = tmp_path / "out.png"
    cli.main(["decode", str(sample_jpeg), str(out), "--backend", "numpy"])
    png = np.asarray(Image.open(out))
    want = decode(
        sample_jpeg.read_bytes(),
        DecodeConfig(entropy_backend=EntropyBackend.NUMPY),
    ).rgb
    np.testing.assert_array_equal(png, want)


def test_encode_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    Image.fromarray(img, "RGB").save(src)
    out = tmp_path / "out.jpg"
    rc = cli.main(["encode", str(src), str(out), "--quality", "90",
                   "--subsampling", "444", "--optimize"])
    assert rc == 0
    decoded = np.asarray(Image.open(out).convert("RGB"))
    assert decoded.shape == (40, 56, 3)


def test_info_json(sample_jpeg, capsys):
    rc = cli.main(["info", str(sample_jpeg), "--json"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["width"] == 64 and info["height"] == 64
    assert info["components"][0]["sampling"] == [2, 2]
    assert info["scans"][0]["tables"]["quant"] == [0, 1]


def test_info_text(sample_jpeg, capsys):
    rc = cli.main(["info", str(sample_jpeg)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "BASELINE" in out and "64x64" in out


def test_cli_module_invocation(sample_jpeg, tmp_path):
    out = tmp_path / "m.ppm"
    r = subprocess.run(
        [sys.executable, "-m", "jpeg_decoder_tpu.cli", "decode",
         str(sample_jpeg), str(out), "--backend", "numpy", "--no-device"],
        capture_output=True, text=True, cwd=Path(__file__).parent.parent,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert r.returncode == 0, r.stderr
    assert out.exists()


def test_decode_file_memmap_matches_bytes(tmp_path):
    """Streaming (np.memmap) input decodes identically to in-memory bytes
    through the whole pipeline (parser, prescan, native entropy decode all
    consume the mapping zero-copy)."""
    import numpy as np

    import jpeg_decoder_tpu as jt
    from tests import corpus

    name, data = corpus.baseline_corpus()[0]
    p = tmp_path / "in.jpg"
    p.write_bytes(data)
    want = jt.decode(data).rgb
    got = jt.decode_file(p).rgb
    np.testing.assert_array_equal(got, want)

def test_decode_file_missing_path_is_typed(tmp_path):
    """A missing or unreadable path raises JpegFormatError, not a bare
    FileNotFoundError — decode_file keeps the same typed-error contract
    decode() has (advisor r3 finding)."""
    import pytest

    import jpeg_decoder_tpu as jt
    from jpeg_decoder_tpu.utils.errors import JpegFormatError

    with pytest.raises(JpegFormatError):
        jt.decode_file(tmp_path / "does-not-exist.jpg")


def test_parsed_table_cache_is_frozen():
    """Cached DHT/DQT parse results hand out frozen arrays and fresh list
    objects, so an in-place tweak by one caller cannot corrupt another
    parse of the same bytes (advisor r3 finding)."""
    import pytest

    from jpeg_decoder_tpu.io import parser
    from tests import corpus

    name, data = corpus.baseline_corpus()[0]
    scan = parser.parse(data).scans[0]
    # The spec objects may be shared across parses of identical bytes, but
    # their arrays must refuse in-place writes.
    qt = next(iter(scan.quant_tables.values()))
    with pytest.raises(ValueError):
        qt.values[0] = 99
    spec = next(iter(scan.dc_tables.values()))
    with pytest.raises(ValueError):
        spec.counts[0] = 1
    with pytest.raises(ValueError):
        spec.symbols[0] = 1


def test_decode_streamed_and_striped_match_plain(sample_jpeg, tmp_path):
    """--streamed / --striped route through the gigapixel engines and must
    produce the same pixels as the plain decode."""
    plain, streamed, striped = (
        tmp_path / "a.npy", tmp_path / "b.npy", tmp_path / "c.npy"
    )
    assert cli.main(["decode", str(sample_jpeg), str(plain)]) == 0
    assert cli.main(
        ["decode", str(sample_jpeg), str(streamed), "--streamed",
         "--chunks", "2"]
    ) == 0
    assert cli.main(
        ["decode", str(sample_jpeg), str(striped), "--striped"]
    ) == 0
    want = np.load(plain)
    np.testing.assert_array_equal(np.load(streamed), want)
    np.testing.assert_array_equal(np.load(striped), want)


@pytest.mark.parametrize("sub", ["411", "440", "mixed"])
def test_encode_exotic_subsampling_flags(sub, tmp_path):
    """The exotic-but-legal factor sets are reachable from the CLI and
    the result decodes back through the CLI."""
    rng = np.random.default_rng(3)
    src = tmp_path / "in.npy"
    np.save(src, rng.integers(0, 256, (40, 48, 3), dtype=np.uint8))
    jpg = tmp_path / "out.jpg"
    rc = cli.main(["encode", str(src), str(jpg), "--subsampling", sub,
                   "--quality", "90"])
    assert rc == 0 and jpg.stat().st_size > 0
    out = tmp_path / "back.npy"
    assert cli.main(["decode", str(jpg), str(out)]) == 0
    assert np.load(out).shape == (40, 48, 3)


def test_info_reports_progressive(tmp_path, capsys):
    """`info` must expose the coding process and scan script for
    progressive (SOF2) streams."""
    from jpeg_decoder_tpu.models.encoder import encode
    from jpeg_decoder_tpu.utils.config import EncodeConfig

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p = tmp_path / "prog.jpg"
    p.write_bytes(encode(img, EncodeConfig(progressive=True)))
    assert cli.main(["info", str(p)]) == 0
    text = capsys.readouterr().out
    assert "PROGRESSIVE" in text
    assert text.count("scan") >= 4  # DC scan + one AC scan per component
    assert cli.main(["info", str(p), "--json"]) == 0
    js = json.loads(capsys.readouterr().out)
    assert "PROGRESSIVE" in js["process"]


def test_decode_batch_cli(tmp_path):
    """decode-batch writes one output per input (mixed sequential +
    progressive), each matching the single-file decode route."""
    from jpeg_decoder_tpu.models.decoder import decode
    from jpeg_decoder_tpu.utils.config import DecodeConfig

    srcs = []
    for i, (name, data) in enumerate(corpus.baseline_corpus()[:2]):
        p = tmp_path / f"seq{i}.jpg"
        p.write_bytes(data)
        srcs.append(p)
    name, data = corpus.progressive_corpus()[0]
    p = tmp_path / "prog0.jpg"
    p.write_bytes(data)
    srcs.append(p)

    out_dir = tmp_path / "out"
    rc = cli.main(
        ["decode-batch", *map(str, srcs), "--out-dir", str(out_dir),
         "--format", "npy", "--no-device", "--jobs", "2"]
    )
    assert rc == 0
    cfg = DecodeConfig(use_device=False)
    for p in srcs:
        got = np.load(out_dir / f"{p.stem}.npy")
        want = decode(p.read_bytes(), cfg).rgb
        np.testing.assert_array_equal(got, want)


def test_decode_scale_flag(sample_jpeg, tmp_path):
    """--scale 1/2 produces the half-size output of the scaled decoder."""
    from PIL import Image

    from jpeg_decoder_tpu.models.decoder import decode_rgb
    from jpeg_decoder_tpu.utils.config import (
        DecodeConfig, EntropyBackend, IdctPrecision)

    out = tmp_path / "half.png"
    rc = cli.main(["decode", str(sample_jpeg), str(out),
                   "--backend", "numpy", "--precision", "float32",
                   "--scale", "1/2"])
    assert rc == 0
    png = np.asarray(Image.open(out))
    want = decode_rgb(
        sample_jpeg.read_bytes(),
        DecodeConfig(entropy_backend=EntropyBackend.NUMPY,
                     idct_precision=IdctPrecision.FLOAT32, scale=4),
    )
    assert png.shape == (32, 32, 3)
    np.testing.assert_array_equal(png, want)


def test_decode_scale_rejects_gigapixel_routes(sample_jpeg, tmp_path):
    rc = cli.main(["decode", str(sample_jpeg), str(tmp_path / "x.png"),
                   "--scale", "1/4", "--streamed"])
    assert rc == 2
