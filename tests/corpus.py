"""Deterministic conformance corpus, generated with Pillow.

Mirrors the reference's corpus-based test style (its .gitignore'd example/
directory of JPEGs, SURVEY.md §4) but deterministic and self-generating.
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image


def _noise(rng, shape):
    return rng.integers(0, 256, shape, dtype=np.uint8)


def _gradient(h, w):
    x = np.linspace(0, 255, w, dtype=np.uint8)
    y = np.linspace(0, 255, h, dtype=np.uint8)
    return np.stack(
        [np.tile(x, (h, 1)), np.tile(y[:, None], (1, w)), np.full((h, w), 77, np.uint8)],
        axis=-1,
    )


def make_jpeg(arr: np.ndarray, mode: str, **save_kw) -> bytes:
    im = Image.fromarray(arr, mode)
    buf = io.BytesIO()
    im.save(buf, "JPEG", **save_kw)
    return buf.getvalue()


def baseline_corpus(seed: int = 1234) -> list[tuple[str, bytes]]:
    """(name, jpeg_bytes) for sequential-baseline conformance."""
    rng = np.random.default_rng(seed)
    out = []
    g64 = _noise(rng, (64, 64))
    g_odd = _noise(rng, (31, 23))
    c64 = _noise(rng, (64, 64, 3))
    c_odd = _noise(rng, (67, 45, 3))
    grad = _gradient(80, 96)
    out.append(("gray_64_q85", make_jpeg(g64, "L", quality=85)))
    out.append(("gray_odd_q85", make_jpeg(g_odd, "L", quality=85)))
    out.append(("gray_64_q10", make_jpeg(g64, "L", quality=10)))
    out.append(("rgb444_q90", make_jpeg(c64, "RGB", quality=90, subsampling=0)))
    out.append(("rgb422_q75", make_jpeg(c64, "RGB", quality=75, subsampling=1)))
    out.append(("rgb420_q90", make_jpeg(c64, "RGB", quality=90, subsampling=2)))
    out.append(("rgb420_odd_q85", make_jpeg(c_odd, "RGB", quality=85, subsampling=2)))
    out.append(("rgb444_q100", make_jpeg(c64, "RGB", quality=100, subsampling=0)))
    out.append(("rgb420_q10", make_jpeg(c64, "RGB", quality=10, subsampling=2)))
    out.append(("smooth420_q95", make_jpeg(grad, "RGB", quality=95, subsampling=2)))
    out.append(
        ("cmyk_q90", make_jpeg(_noise(rng, (40, 56, 4)), "CMYK", quality=90))
    )
    return out


def dri_corpus(seed: int = 99) -> list[tuple[str, bytes, bytes]]:
    """(name, dri_bytes, plain_bytes): same image with and without restart
    markers — restart markers must not change decoded output
    (verified reference property, BASELINE.md)."""
    rng = np.random.default_rng(seed)
    out = []
    for name, arr, mode, kw in [
        ("dri_rows2_420", _noise(rng, (64, 64, 3)), "RGB", dict(subsampling=2)),
        ("dri_rows1_444", _noise(rng, (48, 80, 3)), "RGB", dict(subsampling=0)),
        ("dri_blocks4", _gradient(64, 64), "RGB", dict(subsampling=2)),
        ("dri_gray", _noise(rng, (56, 72)), "L", dict()),
    ]:
        dri_kw = dict(kw)
        if "blocks" in name:
            dri_kw["restart_marker_blocks"] = 4
        elif "rows1" in name:
            dri_kw["restart_marker_rows"] = 1
        else:
            dri_kw["restart_marker_rows"] = 2
        dri = make_jpeg(arr, mode, quality=88, **dri_kw)
        plain = make_jpeg(arr, mode, quality=88, **kw)
        out.append((name, dri, plain))
    return out


def progressive_corpus(seed: int = 5) -> list[tuple[str, bytes]]:
    rng = np.random.default_rng(seed)
    out = []
    out.append(
        (
            "prog_gray",
            make_jpeg(_noise(rng, (64, 48)), "L", quality=85, progressive=True),
        )
    )
    out.append(
        (
            "prog_444",
            make_jpeg(
                _noise(rng, (64, 64, 3)),
                "RGB",
                quality=90,
                subsampling=0,
                progressive=True,
            ),
        )
    )
    out.append(
        (
            "prog_420",
            make_jpeg(
                _gradient(80, 96), "RGB", quality=85, subsampling=2, progressive=True
            ),
        )
    )
    out.append(
        (
            "prog_420_noise",
            make_jpeg(
                _noise(rng, (67, 45, 3)),
                "RGB",
                quality=75,
                subsampling=2,
                progressive=True,
            ),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Wild-shaped corpus: real-world marker clutter, exotic sampling factors,
# multi-scan sequential files, DHT redefinition between scans. Pillow cannot
# write these shapes; the in-repo writer/encoder internals are the source
# (SURVEY.md §4: corpus breadth the reference never had).
# ---------------------------------------------------------------------------


def exif_app1() -> bytes:
    """A minimal structurally-valid Exif APP1: TIFF header + one IFD with an
    Orientation tag — the clutter virtually every camera JPEG carries."""
    import struct

    tiff = b"II*\x00" + struct.pack("<I", 8)
    ifd = struct.pack("<H", 1)  # one entry
    ifd += struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", 1, 0)
    ifd += struct.pack("<I", 0)  # next-IFD offset
    payload = b"Exif\x00\x00" + tiff + ifd
    return b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload


def adobe_app14(transform: int = 1) -> bytes:
    """Adobe APP14 (DCTEncode) segment; transform=1 flags YCbCr."""
    import struct

    payload = b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform)
    return b"\xff\xee" + struct.pack(">H", 2 + len(payload)) + payload


def with_wild_markers(data: bytes) -> bytes:
    """Splice APP1/APP14/COM clutter (plus fill bytes, B.1.1.2) after SOI —
    decoded pixels must be identical to the pristine stream."""
    from jpeg_decoder_tpu.io import writer

    assert data[:2] == b"\xff\xd8"
    clutter = (
        exif_app1()
        + b"\xff"  # fill byte before the next marker
        + adobe_app14()
        + writer.com(b"wild corpus comment \x00 with binary \xff\x00 bytes")
    )
    return data[:2] + clutter + data[2:]


def exotic_sampling_corpus(seed: int = 77) -> list[tuple[str, bytes, np.ndarray]]:
    """(name, jpeg_bytes, source_rgb) for 4:1:1 / 4:4:0 / mixed-factor
    streams written by the in-repo encoder (odd sizes: partial MCUs on both
    axes exercise the per-component wrap math)."""
    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.utils.config import EncodeConfig

    rng = np.random.default_rng(seed)
    out = []
    for sub, shape in [
        ("411", (45, 75, 3)),
        ("440", (53, 41, 3)),
        ("mixed", (37, 59, 3)),
        ("411", (64, 64, 3)),
        ("440", (48, 64, 3)),
    ]:
        arr = _noise(rng, shape)
        data = encoder.encode(arr, EncodeConfig(quality=88, subsampling=sub))
        out.append((f"{sub}_{shape[0]}x{shape[1]}", data, arr))
    return out


def multiscan_sequential(
    arr: np.ndarray,
    quality: int = 88,
    subsampling: str = "420",
    redefine_dht: bool = False,
) -> bytes:
    """A baseline SOF0 file with one NON-interleaved scan per component —
    the legal multi-scan sequential shape (spec B.2.3) Pillow never writes.
    With redefine_dht, each scan is preceded by a DHT that REUSES table id 0
    with different (per-component optimized) codes, forcing per-scan table
    snapshots in the decoder."""
    import dataclasses

    from jpeg_decoder_tpu.core import entropy_encode as ee
    from jpeg_decoder_tpu.core import huffman
    from jpeg_decoder_tpu.io import writer
    from jpeg_decoder_tpu.models import encoder as enc

    h, w = arr.shape[:2]
    qt_l, qt_c = enc.quality_qtables(quality)
    stage, factors, (mcus_x, mcus_y) = enc._build_device_stage(
        h, w, subsampling, (qt_l.tobytes(), qt_c.tobytes()), False
    )
    import jax.numpy as jnp

    coeffs = [np.asarray(c) for c in stage(jnp.asarray(arr))]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    # Per-component raster block sequences over the component's OWN padded
    # grid (ceil(cx/8) x ceil(cy/8)) — the non-interleaved MCU definition.
    seqs = []
    for ci, (fh, fv) in enumerate(factors):
        cx, cy = -(-w * fh // hmax), -(-h * fv // vmax)
        pad_x, pad_y = -(-cx // 8), -(-cy // 8)
        seqs.append(coeffs[ci][:pad_y, :pad_x].reshape(-1, 64))

    def tables_for(blocks):
        freq_dc, freq_ac = ee.count_symbols(
            [(0, b) for b in blocks], 1, 1, [(0, 0)], 1, 0
        )
        dc_spec = dataclasses.replace(
            huffman.optimal_code_lengths(freq_dc[0]), table_class=0, table_id=0
        )
        ac_spec = dataclasses.replace(
            huffman.optimal_code_lengths(freq_ac[0]), table_class=1, table_id=0
        )
        return dc_spec, ac_spec

    parts = [writer.soi(), writer.app0_jfif(), writer.dqt(0, qt_l),
             writer.dqt(1, qt_c)]
    sof_comps = [
        (ci + 1, fh, fv, 0 if ci == 0 else 1)
        for ci, (fh, fv) in enumerate(factors)
    ]
    parts.append(writer.sof(w, h, sof_comps))
    if not redefine_dht:
        # One shared table set up front (Annex K).
        shared = [
            huffman.annex_k_dc_luminance(), huffman.annex_k_ac_luminance(),
        ]
        for s in shared:
            parts.append(writer.dht(s))
    for ci in range(3):
        if redefine_dht:
            dc_spec, ac_spec = tables_for(seqs[ci])
            parts.append(writer.dht(dc_spec))
            parts.append(writer.dht(ac_spec))
        else:
            dc_spec, ac_spec = shared
        dc_t = huffman.build_encode_table(dc_spec)
        ac_t = huffman.build_encode_table(ac_spec)
        entropy = ee.encode_blocks(
            [(0, b) for b in seqs[ci]], [dc_t], [ac_t], [(0, 0)], 1, 0
        )
        parts.append(writer.sos([(ci + 1, 0, 0)]))
        parts.append(entropy)
    parts.append(writer.eoi())
    return b"".join(parts)
