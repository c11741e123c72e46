"""Batched Pallas entropy decode rate on hardware (VERDICT r2 item 2c).

Packs segments from a BATCH of same-config 4K images into full-occupancy
G=8 invocations (ops/entropy_pallas.entropy_decode_batch) and reports the
aggregate device entropy rate per chip — the serving-shape number the
single-image path cannot show (135 segments only half-fill a G=2
invocation).

Run on the TPU host:  python benchmarks/pallas_batched.py [--images 8]
Writes benchmarks/PALLAS_BATCHED.json. Timing is wall-clock over the
whole batched call minus the host scatter (reported separately): through
the axon tunnel, per-invocation dispatch (~30 ms) is part of what
batching amortizes, so the wall number is the honest serving rate.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.ops import entropy_pallas
    from jpeg_decoder_tpu.utils.config import DecodeConfig, EncodeConfig

    rng = np.random.default_rng(20260818)
    datas = []
    for _ in range(args.images):
        arr = rng.integers(
            0, 256, (args.height, args.width, 3), dtype=np.uint8
        )
        datas.append(encoder.encode(
            arr,
            EncodeConfig(quality=85, subsampling="420",
                         restart_interval=args.width // 16),
        ))
    structures = [parse(d) for d in datas]
    n_segs = sum(s.scans[0].span.num_segments for s in structures)
    px = args.images * args.width * args.height
    cfg = DecodeConfig()

    # warm (compiles the G=8 kernel once)
    entropy_pallas.entropy_decode_batch(structures, cfg)
    ts = []
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        entropy_pallas.entropy_decode_batch(structures, cfg)
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))

    result = {
        "artifact": "pallas_batched_entropy",
        "platform": jax.devices()[0].platform,
        "images": args.images,
        "segments": n_segs,
        "lanes_per_invocation": 1024,
        "batch_wall_s": round(t, 3),
        "mp_per_s": round(px / t / 1e6, 1),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "PALLAS_BATCHED.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
