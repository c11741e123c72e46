"""Seeded mutation fuzzer for the parser + native decoder.

Contract under test (the reference contrast: no bounds checks anywhere,
/root/reference/src/bitstream.c:10, and silent exit(1)s, decode.c:861):

  1. EVERY mutated byte stream either decodes or raises a typed JpegError —
     never an unstructured exception, crash, hang, or silent exit.
  2. When BOTH the native backend and the bit-serial oracle succeed on the
     same mutated stream, their outputs agree bitwise (the corruption
     landed somewhere harmless or decodably-wrong — both engines must be
     wrong IDENTICALLY).

Run against the sanitizer-instrumented library to turn case 1 into a
memory-safety proof:

    python -m jpeg_decoder_tpu.native.build           # ensure base build
    tests/tools/sanitize.sh asan-build                # or build manually
    JDT_LIB=jpeg_decoder_tpu/native/build/libjdt-asan.so \
        python tests/tools/fuzz.py --cases 10000

Mutation classes (seeded, reproducible): entropy-region bit flips, random
byte writes anywhere, truncation, garbage extension, segment length-field
corruption, marker-byte rewrites. Writes a JSON report and exits nonzero
on any contract violation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def _build_corpus() -> list[tuple[str, bytes]]:
    """Small, structurally diverse seeds: generated baseline/DRI/
    progressive/exotic corpora plus the smallest wild files."""
    from tests import corpus

    seeds: list[tuple[str, bytes]] = []
    seeds += corpus.baseline_corpus()[:6]
    seeds += [(n, d) for n, d, _r in corpus.dri_corpus()[:3]]
    seeds += corpus.progressive_corpus()[:3]
    seeds += [(n, d) for n, d, _a in corpus.exotic_sampling_corpus()[:3]]
    wild = sorted(
        (REPO / "tests" / "wild_files").glob("*.jpg"),
        key=lambda p: p.stat().st_size,
    )
    for p in wild[:4]:
        seeds.append((p.name, p.read_bytes()))
    return seeds


def _mutate(rng: np.random.Generator, data: bytes) -> tuple[str, bytes]:
    kind = rng.choice(
        ["bitflip", "byte", "truncate", "extend", "length", "marker"]
    )
    buf = bytearray(data)
    n = len(buf)
    if kind == "bitflip":
        # Cluster flips in the back half — usually entropy data.
        for _ in range(int(rng.integers(1, 9))):
            i = int(rng.integers(n // 4, n))
            buf[i] ^= 1 << int(rng.integers(0, 8))
    elif kind == "byte":
        for _ in range(int(rng.integers(1, 6))):
            buf[int(rng.integers(2, n))] = int(rng.integers(0, 256))
    elif kind == "truncate":
        buf = buf[: int(rng.integers(2, n))]
    elif kind == "extend":
        buf += bytes(rng.integers(0, 256, int(rng.integers(1, 512)),
                                  dtype=np.uint8))
    elif kind == "length":
        # Find a marker segment with a length field and corrupt it.
        pos = [i for i in range(2, min(n - 4, 4096))
               if buf[i] == 0xFF and 0xC0 <= buf[i + 1] <= 0xFE
               and buf[i + 1] not in (0xD8, 0xD9)
               and not (0xD0 <= buf[i + 1] <= 0xD7)]
        if pos:
            i = int(pos[int(rng.integers(0, len(pos)))])
            which = int(rng.integers(0, 3))
            if which == 0:
                buf[i + 2] = 0xFF
                buf[i + 3] = 0xFF
            elif which == 1:
                buf[i + 2] = 0
                buf[i + 3] = int(rng.integers(0, 4))
            else:
                buf[i + 3] = int(rng.integers(0, 256))
    elif kind == "marker":
        pos = [i for i in range(2, n - 1) if buf[i] == 0xFF]
        if pos:
            i = int(pos[int(rng.integers(0, len(pos)))])
            buf[i + 1] = int(rng.integers(0, 256))
    return str(kind), bytes(buf)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=20260819)
    ap.add_argument("--report", default=str(Path(__file__).parent /
                                            "fuzz_report.json"))
    ap.add_argument("--oracle-check", type=int, default=1,
                    help="cross-check oracle agreement on native success")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from jpeg_decoder_tpu.models import decoder
    from jpeg_decoder_tpu.native import runtime as native_runtime
    from jpeg_decoder_tpu.utils.config import DecodeConfig, EntropyBackend
    from jpeg_decoder_tpu.utils.errors import JpegError

    assert native_runtime.available(), "native runtime must be loadable"
    cfg_native = DecodeConfig(use_device=False)
    cfg_oracle = DecodeConfig(
        entropy_backend=EntropyBackend.ORACLE, use_device=False
    )

    seeds = _build_corpus()
    rng = np.random.default_rng(args.seed)
    stats = {k: 0 for k in ("ok", "typed_error")}
    by_kind: dict[str, int] = {}
    untyped: list[dict] = []
    mismatches: list[dict] = []
    divergences = 0  # one engine decodes, the other raises (allowed:
    #                  truncation contracts differ per backend)
    t0 = time.time()
    for case in range(args.cases):
        name, seed_data = seeds[case % len(seeds)]
        kind, mut = _mutate(rng, seed_data)
        by_kind[kind] = by_kind.get(kind, 0) + 1
        rec = {"case": case, "seed": name, "kind": kind}
        try:
            img = decoder.decode(mut, cfg_native)
            native_ok = True
        except JpegError:
            stats["typed_error"] += 1
            native_ok = False
        except Exception as e:  # noqa: BLE001 — the whole point
            untyped.append({**rec, "error": f"{type(e).__name__}: {e}"})
            continue
        if native_ok:
            stats["ok"] += 1
            if args.oracle_check:
                try:
                    ref = decoder.decode(mut, cfg_oracle)
                except JpegError:
                    divergences += 1
                    continue
                except Exception as e:  # noqa: BLE001
                    untyped.append(
                        {**rec, "error": f"oracle {type(e).__name__}: {e}"}
                    )
                    continue
                if not np.array_equal(img.rgb, ref.rgb):
                    mismatches.append(rec)
        if case % 1000 == 999:
            print(f"  {case + 1}/{args.cases} "
                  f"(ok {stats['ok']}, typed {stats['typed_error']}, "
                  f"untyped {len(untyped)}, mismatch {len(mismatches)})",
                  file=sys.stderr, flush=True)

    report = {
        "cases": args.cases,
        "seed": args.seed,
        "jdt_lib": os.environ.get("JDT_LIB", "(default build)"),
        "seeds": [n for n, _ in seeds],
        "mutations": by_kind,
        "decoded_ok": stats["ok"],
        "typed_errors": stats["typed_error"],
        "success_divergences_native_vs_oracle": divergences,
        "untyped_exceptions": untyped[:50],
        "bitwise_mismatches_on_dual_success": mismatches[:50],
        "elapsed_s": round(time.time() - t0, 1),
        "verdict": ("PASS" if not untyped and not mismatches else "FAIL"),
    }
    Path(args.report).write_text(json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("seeds",)}, indent=1))
    return 0 if report["verdict"] == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
