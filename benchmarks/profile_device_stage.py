"""Breakdown profile of the EXACT device stage on the bench workload.

Times each sub-stage of the fused device program separately (batch-slope
method per docs: t(B=1) vs t(B=8), slope cancels dispatch latency) so
optimization effort lands on the actual hot spot. Writes stderr text only.
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
    """Per-item time via batch slope between two LARGE batches (marginal
    per-image rate improves with batch size on this hardware, so a B=1
    anchor understates throughput; the bench uses B=16)."""
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

    # --- per-component IDCT (EXACT) ---------------------------------------
    pix_planes = []
    for ci, c in enumerate(comps):
        blocks = planes.plane(ci).reshape(-1, 64)

        def f(b, _q=qtables[ci]):
            return idct_ops.idct_blocks(b, _q, IdctPrecision.EXACT, False)

        t = slope_time(f, [blocks])
        log(f"idct_exact comp{ci} {blocks.shape}: {t*1e3:.2f} ms")
        pix = jax.jit(f)(jnp.asarray(blocks))
        pix_planes.append(
            np.asarray(idct_ops.blocks_to_plane(pix, c.blocks_y, c.blocks_x))
        )

    # FLOAT32 matmul for comparison
    blocks0 = planes.plane(0).reshape(-1, 64)

    def f32f(b):
        return idct_ops.idct_blocks(b, qtables[0], IdctPrecision.FLOAT32, False)

    log(f"idct_f32 comp0: {slope_time(f32f, [blocks0])*1e3:.2f} ms")

    # --- upsample + color (EXACT df32) ------------------------------------
    def up_color(y, cb, cr):
        ups = [
            color_ops.nn_upsample(
                p, h, w, c.hsf, c.vsf, frame.max_hsf, frame.max_vsf
            )
            for p, c in zip((y, cb, cr), comps)
        ]
        return color_ops.ycbcr_to_rgb(*ups, True, Quirks.REFERENCE)

    t = slope_time(up_color, pix_planes)
    log(f"upsample+color EXACT: {t*1e3:.2f} ms")

    def up_color_f32(y, cb, cr):
        ups = [
            color_ops.nn_upsample(
                p, h, w, c.hsf, c.vsf, frame.max_hsf, frame.max_vsf
            )
            for p, c in zip((y, cb, cr), comps)
        ]
        return color_ops.ycbcr_to_rgb(*ups, False, Quirks.REFERENCE)

    t = slope_time(up_color_f32, pix_planes)
    log(f"upsample+color f32: {t*1e3:.2f} ms")

    # --- full fused stage --------------------------------------------------
    key = decoder_mod._stage_key(
        frame, decoder_mod.qt_by_comp_bytes(frame, qts), cfg
    )
    stage = decoder_mod.build_stage_raw(key)

    def full(*ps):
        return stage(*ps)[0]

    t = slope_time(full, [planes.plane(ci) for ci in range(frame.ncs)])
    log(f"full fused EXACT stage: {t*1e3:.2f} ms "
        f"({w*h/t/1e6:.0f} MP/s)")


if __name__ == "__main__":
    main()
