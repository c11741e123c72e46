"""Progressive edge shapes Pillow never produces: 12-bit precision (SOF2
allows 8 or 12) and restart markers inside progressive scans (the segment
machinery must reset DC predictors AND the EOB run at every RSTn —
spec G.1.2 + B.2.3). Streams are hand-assembled with the writer/packer."""

import numpy as np
import pytest

from jpeg_decoder_tpu.core import entropy_encode as ee
from jpeg_decoder_tpu.core import huffman, oracle
from jpeg_decoder_tpu.core.types import CoefficientPlanes
from jpeg_decoder_tpu.io import writer
from jpeg_decoder_tpu.io.parser import parse
from jpeg_decoder_tpu.models import decoder
from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend


def _blocks(nb, seed, amp=900):
    rng = np.random.default_rng(seed)
    blocks = np.zeros((nb, 64), dtype=np.int32)
    blocks[:, 0] = rng.integers(-1000, 1001, nb)
    for i in range(nb):
        nz = rng.integers(1, 18)
        pos = rng.choice(np.arange(1, 64), nz, replace=False)
        blocks[i, pos] = rng.integers(-amp, amp + 1, nz)
    return blocks


def _progressive_gray(nb_y, nb_x, seed=3, precision=8, ri=0):
    """SOF2 grayscale: one DC scan + one full-band AC scan, optionally with
    restart markers in both scans."""
    nb = nb_y * nb_x
    blocks = _blocks(nb, seed)
    # Frequencies must be counted over the SAME segment structure the
    # emitter uses: restarts reset predictors and cut EOB runs, changing
    # the symbol distribution.
    seg_bounds = (
        [(s0, min(s0 + ri, nb)) for s0 in range(0, nb, ri)]
        if ri else [(0, nb)]
    )
    freq_dc = [np.zeros(256, dtype=np.int64)]
    freq_ac = np.zeros(256, dtype=np.int64)
    for a, b in seg_bounds:
        ee.encode_dc_scan(blocks[a:b, 0], [0], [0], None, freq=freq_dc)
        ee.encode_ac_scan(blocks[a:b], 1, 63, None, freq=freq_ac)
    import dataclasses

    dc_spec = dataclasses.replace(
        huffman.optimal_code_lengths(freq_dc[0]), table_class=0, table_id=0
    )
    ac_spec = dataclasses.replace(
        huffman.optimal_code_lengths(freq_ac), table_class=1, table_id=0
    )
    dc_t = huffman.build_encode_table(dc_spec)
    ac_t = huffman.build_encode_table(ac_spec)

    def with_restarts(encode_segment, n_units):
        """Join per-segment encodings with RSTn (predictors/EOB runs reset
        per segment by construction — each segment encodes independently)."""
        if not ri:
            return encode_segment(0, n_units)
        parts = []
        rst = 0
        for s0 in range(0, n_units, ri):
            if s0:
                parts.append(bytes((0xFF, 0xD0 + ((rst - 1) & 7))))
            parts.append(encode_segment(s0, min(s0 + ri, n_units)))
            rst += 1
        return b"".join(parts)

    dc_entropy = with_restarts(
        lambda a, b: ee.encode_dc_scan(blocks[a:b, 0], [0], [0], [dc_t]), nb
    )
    ac_entropy = with_restarts(
        lambda a, b: ee.encode_ac_scan(blocks[a:b], 1, 63, ac_t), nb
    )

    qt = np.full(64, 4, dtype=np.uint16)
    parts = [
        writer.soi(),
        writer.dqt(0, qt),
        writer.sof(nb_x * 8, nb_y * 8, [(1, 1, 1, 0)],
                   precision=precision, marker=0xC2),
        writer.dht(dc_spec),
        writer.dht(ac_spec),
    ]
    if ri:
        parts.append(writer.dri(ri))
    parts += [writer.sos([(1, 0, 0)], ss=0, se=0), dc_entropy]
    parts += [writer.sos([(1, 0, 0)], ss=1, se=63), ac_entropy]
    parts.append(writer.eoi())
    return b"".join(parts), blocks


def _decoded_coeffs(data, backend):
    cfg = DecodeConfig(entropy_backend=backend, use_device=False)
    s = parse(data)
    if backend == EntropyBackend.ORACLE:
        planes = CoefficientPlanes(s.frame)
        for scan in s.scans:
            oracle.decode_progressive_scan(s, scan, planes)
        return s, planes
    from jpeg_decoder_tpu.native import runtime as nr

    planes, _ = nr.entropy_decode(s, cfg)
    return s, planes


@pytest.mark.parametrize("precision", [8, 12])
def test_progressive_precision_coefficients(precision):
    data, blocks = _progressive_gray(3, 4, precision=precision)
    s = parse(data)
    assert s.frame.precision == precision
    assert len(s.scans) == 2
    for backend in (EntropyBackend.ORACLE, EntropyBackend.NATIVE):
        _s, planes = _decoded_coeffs(data, backend)
        np.testing.assert_array_equal(
            planes.plane(0).reshape(-1, 64), blocks,
            err_msg=f"precision={precision} backend={backend}",
        )


@pytest.mark.parametrize("ri", [1, 3, 5])
def test_progressive_with_restarts(ri):
    """RSTn inside progressive scans: predictors and EOB runs reset per
    segment; segment-parallel native decode must agree with the oracle and
    with the restart-free encoding of the same coefficients."""
    data, blocks = _progressive_gray(4, 5, seed=9, ri=ri)
    s = parse(data)
    assert s.scans[0].span.num_segments == -(-20 // ri)
    for backend in (EntropyBackend.ORACLE, EntropyBackend.NATIVE):
        _s, planes = _decoded_coeffs(data, backend)
        np.testing.assert_array_equal(
            planes.plane(0).reshape(-1, 64), blocks,
            err_msg=f"ri={ri} backend={backend}",
        )
    plain, _ = _progressive_gray(4, 5, seed=9, ri=0)
    want = decoder.decode(
        plain, DecodeConfig(entropy_backend=EntropyBackend.ORACLE,
                            use_device=False)
    ).rgb
    got = decoder.decode(
        data, DecodeConfig(entropy_backend=EntropyBackend.NATIVE,
                           use_device=False)
    ).rgb
    np.testing.assert_array_equal(got, want)


def test_12bit_progressive_full_pipeline():
    data, _blocks = _progressive_gray(2, 3, seed=21, precision=12)
    want = decoder.decode(
        data, DecodeConfig(entropy_backend=EntropyBackend.ORACLE,
                           use_device=False)
    ).rgb
    got = decoder.decode(data, DecodeConfig()).rgb
    np.testing.assert_array_equal(got, want)
