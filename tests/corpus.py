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
