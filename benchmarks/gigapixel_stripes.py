"""Gigapixel stripe-mode demo: decode a ~0.5 GP image across the mesh.

The long-context analogue (SURVEY.md §5): ONE huge scan, entropy-decoded as
stripe-aligned restart-segment groups on the host and dequant+IDCT+color
striped over the mesh "stripe" axis. Run on the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/gigapixel_stripes.py [--height 122880]

Writes benchmarks/GIGAPIXEL.json with sizes, stage timings, and an output
digest. Correctness of the striped path vs the whole-image path is covered
at test scale by tests/test_parallel.py::TestStripes; this artifact proves
the gigapixel capability (memory-scalable stripes, arbitrary heights).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main() -> int:
    ap = argparse.ArgumentParser()
    # SOF dimension fields are uint16 (spec B.2.2): stay <= 65535/side.
    ap.add_argument("--width", type=int, default=16384)
    ap.add_argument("--height", type=int, default=32768)  # 0.537 GP
    ap.add_argument("--quality", type=int, default=85)
    args = ap.parse_args()

    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.parallel import mesh as mesh_mod
    from jpeg_decoder_tpu.parallel import stripes
    from jpeg_decoder_tpu.utils.config import (
        DecodeConfig, EncodeConfig, IdctPrecision,
    )

    w, h = args.width, args.height
    px = w * h
    print(f"# generating {w}x{h} ({px/1e9:.3f} GP) 4:2:0 q{args.quality}",
          file=sys.stderr, flush=True)
    rng = np.random.default_rng(20260817)
    tile = rng.integers(0, 256, (512, w, 3), dtype=np.uint8)
    img = np.broadcast_to(tile, (h // 512, 512, w, 3)).reshape(h, w, 3)

    mcus_x = -(-w // 16)
    t0 = time.perf_counter()
    data = encoder.encode(
        img,
        EncodeConfig(quality=args.quality, subsampling="420",
                     restart_interval=mcus_x),
    )
    t_enc = time.perf_counter() - t0
    print(f"# encoded: {len(data)/1e6:.0f} MB in {t_enc:.1f}s",
          file=sys.stderr, flush=True)
    del img

    mesh = mesh_mod.make_mesh(n_data=1, n_stripe=len(jax.devices()))
    cfg = DecodeConfig(idct_precision=IdctPrecision.FLOAT32)

    s = parse(data)
    striped = stripes.entropy_decode_striped(s, cfg, len(jax.devices()))
    entropy_striped = striped is not None
    del striped, s

    t0 = time.perf_counter()
    rgb = stripes.decode_striped(data, cfg, mesh)
    t_dec = time.perf_counter() - t0
    digest = hashlib.sha256(np.ascontiguousarray(rgb[::997])).hexdigest()[:16]

    result = {
        "artifact": "gigapixel_striped_decode",
        "width": w,
        "height": h,
        "gigapixels": round(px / 1e9, 3),
        "file_mb": round(len(data) / 1e6, 1),
        "n_stripes": len(jax.devices()),
        "entropy_striped": bool(entropy_striped),
        "decode_s": round(t_dec, 2),
        "mp_per_s": round(px / t_dec / 1e6, 1),
        "platform": jax.devices()[0].platform,
        "output_digest": digest,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "GIGAPIXEL.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
