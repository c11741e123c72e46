"""Attribution profile of the EXACT device stage on the bench workload.

Sub-stage timings are recovered by SUBSTITUTION, not by isolating
subprograms: the full fused stage is timed with each numeric contract
swapped independently (EXACT vs FLOAT32 idct x exact vs f32 color), all at
the bench's batch size so XLA fusion matches the production program.
Isolated subprogram timing is misleading here — un-fused (N, 8, 8) int16
intermediates materialize with ~16-42x tile padding and OOM the chip.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope_time(fn, args, small=4, big=16, reps=5):
    f = jax.jit(jax.vmap(fn))

    def run(b):
        arrs = [jnp.asarray(np.stack([a] * b)) for a in args]
        out = f(*arrs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1]))  # warm+sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*arrs)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
            ts.append(time.perf_counter() - t0)
        del arrs, out
        return float(np.median(ts))

    ts, tb = run(small), run(big)
    return max((tb - ts) / (big - small), tb / big)


def main():
    sys.path.insert(0, ".")
    from bench import make_input
    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.models import decoder as decoder_mod
    from jpeg_decoder_tpu.ops import color as color_ops
    from jpeg_decoder_tpu.ops import idct as idct_ops
    from jpeg_decoder_tpu.utils.config import (
        DecodeConfig, IdctPrecision, Quirks,
    )

    data = make_input()
    cfg = DecodeConfig(idct_precision=IdctPrecision.EXACT)
    structure = parse(data, cfg)
    planes, qts = decoder_mod._entropy_decode(structure, cfg)
    frame = structure.frame
    comps = frame.components
    h, w = frame.height, frame.width
    log(f"device: {jax.devices()[0].device_kind}")
    qtables = [np.asarray(qts[c.qtid], dtype=np.uint16) for c in comps]

    def make_stage(idct_precision, color_exact):
        def stage(*coeff_planes):
            pix = []
            for ci, c in enumerate(comps):
                blocks = coeff_planes[ci].reshape(-1, 64)
                p = idct_ops.idct_blocks(
                    blocks, qtables[ci], idct_precision, False
                )
                pix.append(
                    idct_ops.blocks_to_plane(p, c.blocks_y, c.blocks_x)
                )
            ups = [
                color_ops.nn_upsample(
                    p, h, w, c.hsf, c.vsf, frame.max_hsf, frame.max_vsf
                )
                for p, c in zip(pix, comps)
            ]
            return color_ops.ycbcr_to_rgb(*ups, color_exact, Quirks.REFERENCE)

        return stage

    args = [planes.plane(ci) for ci in range(frame.ncs)]
    variants = [
        ("EXACT idct + exact color (production)", IdctPrecision.EXACT, True),
        ("EXACT idct + f32 color", IdctPrecision.EXACT, False),
        ("f32 idct + exact color", IdctPrecision.FLOAT32, True),
        ("f32 idct + f32 color  ", IdctPrecision.FLOAT32, False),
    ]
    for name, prec, cx in variants:
        try:
            t = slope_time(make_stage(prec, cx), args)
            log(f"{name}: {t*1e3:.2f} ms/img = {w*h/t/1e6:.0f} MP/s")
        except Exception as e:
            log(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})")
        jax.clear_caches()


if __name__ == "__main__":
    main()
