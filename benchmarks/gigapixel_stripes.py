"""Gigapixel stripe-mode demo: decode a ~0.5 GP image across the mesh.

The long-context analogue (SURVEY.md §5): ONE huge scan, entropy-decoded as
stripe-aligned restart-segment groups on the host and dequant+IDCT+color
striped over the mesh "stripe" axis. Run on the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/gigapixel_stripes.py [--height 122880]

Writes benchmarks/GIGAPIXEL.json with sizes, stage timings, an output
digest, and the peak-RSS comparison of the two input paths:

  * bytes  — whole file read into memory (the r2 behavior);
  * memmap — np.memmap streaming input (models/decoder.decode_file's
    mechanism; reference analogue jpeg_decoder.c:143-177): bytes page in
    lazily and the OS can evict them, so peak RSS is bounded by
    planes + output rather than file + planes + output.

Each decode runs in a SUBPROCESS so ru_maxrss is a clean per-path
high-water mark (the parent's encode allocates the full source image and
would mask it). Correctness of the striped path vs the whole-image path is
covered at test scale by tests/test_parallel.py::TestStripes; this
artifact proves the gigapixel capability (memory-scalable stripes,
arbitrary heights, streaming input).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def _decode_child(path: str, input_mode: str) -> int:
    """Subprocess body: decode `path` striped, print one JSON line."""
    from jpeg_decoder_tpu.parallel import mesh as mesh_mod
    from jpeg_decoder_tpu.parallel import stripes
    from jpeg_decoder_tpu.utils.config import DecodeConfig, IdctPrecision

    if input_mode == "memmap":
        data = np.memmap(path, dtype=np.uint8, mode="r")
    else:
        with open(path, "rb") as f:
            data = np.frombuffer(f.read(), dtype=np.uint8)
    mesh = mesh_mod.make_mesh(n_data=1, n_stripe=len(jax.devices()))
    cfg = DecodeConfig(idct_precision=IdctPrecision.FLOAT32)
    t0 = time.perf_counter()
    rgb = stripes.decode_striped(data, cfg, mesh)
    t_dec = time.perf_counter() - t0
    digest = hashlib.sha256(np.ascontiguousarray(rgb[::997])).hexdigest()[:16]
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    print(json.dumps({
        "input_mode": input_mode,
        "decode_s": round(t_dec, 2),
        "peak_rss_mb": round(peak_mb, 0),
        "output_digest": digest,
        "h": int(rgb.shape[0]), "w": int(rgb.shape[1]),
    }))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    # SOF dimension fields are uint16 (spec B.2.2): stay <= 65535/side.
    ap.add_argument("--width", type=int, default=16384)
    ap.add_argument("--height", type=int, default=32768)  # 0.537 GP
    ap.add_argument("--quality", type=int, default=85)
    ap.add_argument("--decode-only", default=None, help="(internal) child")
    ap.add_argument("--input-mode", default="memmap",
                    choices=["memmap", "bytes"])
    args = ap.parse_args()
    if args.decode_only:
        return _decode_child(args.decode_only, args.input_mode)

    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.io.parser import parse
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

    cfg = DecodeConfig(idct_precision=IdctPrecision.FLOAT32)
    s = parse(data)
    striped = stripes.entropy_decode_striped(s, cfg, len(jax.devices()))
    entropy_striped = striped is not None
    del striped, s

    # Write the stream to disk; decode in subprocesses (clean peak-RSS).
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".gigapixel_input.jpg")
    with open(path, "wb") as f:
        f.write(data)
    file_mb = len(data) / 1e6
    del data

    runs = {}
    for mode in ("memmap", "bytes"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--decode-only", path, "--input-mode", mode,
             "--width", str(w), "--height", str(h)],
            env=os.environ, capture_output=True, text=True, timeout=1800,
        )
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            return 1
        runs[mode] = json.loads(r.stdout.strip().splitlines()[-1])
        print(f"# {mode}: {runs[mode]}", file=sys.stderr, flush=True)
    os.unlink(path)

    if runs["memmap"]["output_digest"] != runs["bytes"]["output_digest"]:
        print("DIGEST MISMATCH between input modes", file=sys.stderr)
        return 1

    m = runs["memmap"]
    result = {
        "artifact": "gigapixel_striped_decode",
        "width": w,
        "height": h,
        "gigapixels": round(px / 1e9, 3),
        "file_mb": round(file_mb, 1),
        "n_stripes": len(jax.devices()),
        "entropy_striped": bool(entropy_striped),
        "decode_s": m["decode_s"],
        "mp_per_s": round(px / m["decode_s"] / 1e6, 1),
        "peak_rss_mb_memmap": m["peak_rss_mb"],
        "peak_rss_mb_bytes": runs["bytes"]["peak_rss_mb"],
        "platform": jax.devices()[0].platform,
        "output_digest": m["output_digest"],
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "GIGAPIXEL.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
