"""Generate tests/wild_files/transcoded/ — foreign-encoder (libjpeg via
Pillow) transcodes of the wild corpus covering the stream shapes the
original 22 files are thin on (VERDICT r3 item 7): progressive, restart
markers, 4:4:4 / 4:2:2 sampling, optimized Huffman tables, a 16-bit-DQT
file (libjpeg emits Pq=1 when very low quality pushes table values past
255), and a 4-component Adobe CMYK file.

The ENCODER here is libjpeg-turbo (Pillow's backend) — a genuinely
foreign bit-packer, marker writer, and table generator; only the pixel
CONTENT comes from the existing wild files. 12-bit precision has no
foreign encoder in this image (Pillow/libjpeg-turbo are built 8-bit);
the synthetic 12-bit suite (tests/test_12bit.py) remains the coverage
for that axis — recorded in SOURCES.txt.

Deterministic: same inputs -> same outputs. Run from the repo root:
    python tests/tools/make_transcoded_corpus.py
"""

from __future__ import annotations

import io
import os

from PIL import Image

WILD = os.path.join(os.path.dirname(__file__), "..", "wild_files")
OUT = os.path.join(WILD, "transcoded")


def _save(img: Image.Image, name: str, **kw) -> str:
    os.makedirs(OUT, exist_ok=True)
    buf = io.BytesIO()
    img.save(buf, "JPEG", **kw)
    path = os.path.join(OUT, name)
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    return path


def main() -> None:
    hopper = Image.open(os.path.join(WILD, "matplotlib_grace_hopper.jpg"))
    china = Image.open(os.path.join(WILD, "sklearn_china.jpg"))
    blade = Image.open(os.path.join(WILD, "pygame_intro_blade.jpg"))
    flower = Image.open(os.path.join(WILD, "requests_flower-of-life.jpg"))

    made = []
    # Progressive (libjpeg's standard 10-scan script), three samplings.
    made.append(_save(hopper, "hopper_progressive_420.jpg",
                      quality=80, subsampling=2, progressive=True))
    made.append(_save(blade, "blade_progressive_444.jpg",
                      quality=90, subsampling=0, progressive=True))
    made.append(_save(hopper.convert("L"), "hopper_progressive_gray.jpg",
                      quality=85, progressive=True))
    # Restart markers (the DRI axis: 1 wild file had them).
    made.append(_save(china, "china_dri_rows1_420.jpg",
                      quality=85, subsampling=2, restart_marker_rows=1))
    made.append(_save(flower, "flower_dri_blocks7_422.jpg",
                      quality=85, subsampling=1, restart_marker_blocks=7))
    # Sampling + optimized-Huffman axes.
    made.append(_save(blade, "blade_444_optimized.jpg",
                      quality=92, subsampling=0, optimize=True))
    made.append(_save(hopper, "hopper_422.jpg", quality=85, subsampling=1))
    # 16-bit DQT: libjpeg clamps quality-derived tables to 255 (baseline
    # force), but explicit qtables past 255 make it emit Pq=1 (16-bit
    # entries) — it prints "Caution: quantization tables are too coarse
    # for baseline JPEG" and writes the extended-precision DQT.
    qt = [min(1000 + i * 8, 3000) for i in range(64)]
    made.append(_save(china, "china_qt16_dqt16.jpg",
                      qtables=[qt, qt], subsampling=2))
    # 4-component Adobe CMYK (APP14; libjpeg stores CMYK un-transformed).
    made.append(_save(hopper.convert("CMYK"), "hopper_cmyk_adobe.jpg",
                      quality=88))
    for p in made:
        print(os.path.relpath(p), os.path.getsize(p))


if __name__ == "__main__":
    main()
