"""Shared per-scan decode driver.

JPEG table state is mutable stream state (DHT/DQT/DRI may be redefined
between scans; the reference keeps them as mutable locals in
decode_jpeg_buffer, /root/reference/src/decode.c:146-158). Every entropy
backend needs the same loop — accumulate the quant-table state a scan sees,
then dispatch the scan — so it lives here once instead of being repeated
per backend (oracle / numpy / native / device).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .types import CoefficientPlanes, JpegStructure, Scan


def run_scans(
    structure: JpegStructure,
    planes: CoefficientPlanes,
    decode_scan: Callable[[JpegStructure, Scan, CoefficientPlanes], None],
) -> dict[int, np.ndarray]:
    """Decode every scan into `planes`; returns qtid -> natural-order
    quant-table values (the accumulated table state after all scans)."""
    qts: dict[int, np.ndarray] = {}
    for scan in structure.scans:
        for tid, qt in scan.quant_tables.items():
            qts[tid] = qt.values
        decode_scan(structure, scan, planes)
    return qts
