"""NumPy/LUT host entropy backend — no native toolchain required.

Same scan-loop logic as the oracle (core/oracle.py — the two share one
implementation via pluggable readers/tables), but each Huffman symbol
resolves through a flat 16-bit LUT with a byte-addressed reader
(io/bitstream.FastBitReader) instead of the reference-mirroring bit-by-bit
walk. Several times faster than the oracle; the native C++ runtime
(native/runtime.py) is faster still and is the default.
"""

from __future__ import annotations

import numpy as np

from ..io import bitstream as bsio
from ..io.markers import Encoding
from ..utils.config import DecodeConfig
from .huffman import build_canonical, build_flat_lut
from .types import CoefficientPlanes, HuffTableSpec, JpegStructure
from . import oracle


def _lut_builder(spec: HuffTableSpec):
    return build_flat_lut(build_canonical(spec))


def entropy_decode(structure: JpegStructure, cfg: DecodeConfig):
    """All scans -> (CoefficientPlanes, qtid -> natural-order table)."""
    frame = structure.frame
    planes = CoefficientPlanes(frame)
    qts: dict[int, np.ndarray] = {}
    for scan in structure.scans:
        for tid, qt in scan.quant_tables.items():
            qts[tid] = qt.values
        if frame.process == Encoding.PROGRESSIVE_DCT:
            oracle.decode_progressive_scan(
                structure, scan, planes,
                reader_cls=bsio.FastBitReader,
                table_builder=_lut_builder,
            )
        else:
            oracle.decode_sequential_scan(
                structure, scan, planes,
                reader_cls=bsio.FastBitReader,
                table_builder=_lut_builder,
            )
    return planes, qts
