"""Headline benchmark: 4K 4:2:0 quality-85 high-entropy decode throughput.

Workload matches BASELINE.md's measurement of the reference C decoder
(3840x2160 noise, quality 85, 4:2:0 — its hot path decodes this at ~17 MP/s
single-thread; BASELINE.json records 17.0 MP/s as the number to beat).

Methodology: the decode pipeline is two overlappable stages —
  (1) host: marker parse + native segment-parallel entropy decode
      (restart-interval streams; the reference's speed is unaffected by
      restart markers, so the comparison stays apples-to-apples);
  (2) device: fused dequant+IDCT+upsample+color on the TPU.
Steady-state throughput of the pipeline is bounded by the slower stage, so
the reported rate is total_pixels / max(t_host, t_device), with each stage
timed separately (medians over repeats, compile/warmup excluded). Stage
breakdown goes to stderr; stdout carries exactly one JSON line.

Numeric contract is TWO-TIER and both tiers are measured every run:
  * EXACT — the conformance tier: bit-identical to the compiled reference
    decoder on device (the guard below FAILS the bench on any mismatch).
    The headline pipeline number uses this tier.
  * FLOAT32 — the throughput tier: the IDCT as one MXU matmul, within
    +/-1 LSB of EXACT on a tiny fraction of pixels; its device rate is
    reported as "device_f32_mps" (>= 2 GP/s on v5e — past the 1 GP/s/chip
    north star; the pipeline is host-entropy-bound on this 4-core
    container, not device-bound).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_MPS = 17.0  # BASELINE.md: reference 4K 4:2:0 decode, this machine
W, H = 3840, 2160
CACHE = Path(__file__).resolve().parent / ".bench"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_input() -> bytes:
    CACHE.mkdir(exist_ok=True)
    f = CACHE / "noise_4k_420_q85_dri.jpg"
    if f.exists():
        return f.read_bytes()
    rng = np.random.default_rng(20260816)
    arr = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    try:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(
            buf, "JPEG", quality=85, subsampling=2, restart_marker_rows=1
        )
        data = buf.getvalue()
        if b"\xff\xdd" not in data[:4096]:
            # Older Pillow silently ignores restart_marker_rows: the DRI
            # segment is the whole point of this workload (segment-parallel
            # decode), so fall back to the in-repo encoder.
            raise ValueError("Pillow emitted no DRI segment")
    except Exception:
        from jpeg_decoder_tpu.models import encoder
        from jpeg_decoder_tpu.utils.config import EncodeConfig

        data = encoder.encode(
            arr, EncodeConfig(quality=85, subsampling="420", restart_interval=W // 16)
        )
    f.write_bytes(data)
    return data


def make_input_nodri() -> bytes:
    """Same 4K noise image WITHOUT restart markers — the dominant wild-file
    shape (19/22 of the wild corpus); decoded by the speculative
    self-synchronizing engine rather than the restart-segment lanes."""
    CACHE.mkdir(exist_ok=True)
    f = CACHE / "noise_4k_420_q85_nodri.jpg"
    if f.exists():
        return f.read_bytes()
    rng = np.random.default_rng(20260816)
    arr = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=85, subsampling=2)
    data = buf.getvalue()
    f.write_bytes(data)
    return data


def _host_decode_ms(data: bytes, reps: int = 21) -> float:
    """Median host-stage wall time (fused prescan+entropy, plane pool)."""
    from jpeg_decoder_tpu.models import decoder as decoder_mod
    from jpeg_decoder_tpu.utils.config import DecodeConfig, IdctPrecision

    cfg = DecodeConfig(idct_precision=IdctPrecision.EXACT)
    pool = decoder_mod.PlanePool()
    frame, planes, qts = decoder_mod.host_decode(data, cfg, pool)  # warm
    pool.release(planes)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        frame, planes, qts = decoder_mod.host_decode(data, cfg, pool)
        ts.append(time.perf_counter() - t0)
        pool.release(planes)
    return float(np.median(ts))


def _bench_encode_subprocess() -> dict | None:
    """Encode throughput (4K 4:2:0 q85, full pipeline: device FDCT+quantize
    stage + host Huffman pack + writer), measured in a CPU-forced
    subprocess so a hung TPU tunnel cannot stall it. Returns
    {encode_mps, encode_ms, encode_fdct_ms} or None on failure. The FDCT
    stage is also timed alone (synced) so the host-pack share is visible:
    encode_pack_ms ~= encode_ms - encode_fdct_ms."""
    import subprocess

    script = r"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jpeg_decoder_tpu.models import encoder as encoder_mod
from jpeg_decoder_tpu.utils.config import EncodeConfig
H, W = 2160, 3840
rng = np.random.default_rng(20260816)
arr = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
cfg = EncodeConfig(quality=85, subsampling="420", restart_interval=W // 16)
enc = encoder_mod.JpegEncoder(cfg)
data = enc.encode(arr)  # warm (jit compile)
ts = []
for _ in range(7):
    t0 = time.perf_counter(); enc.encode(arr); ts.append(time.perf_counter() - t0)
# device(FDCT+quantize) stage alone, synced
qt_l, qt_c = encoder_mod.quality_qtables(cfg.quality)
stage, factors, _ = encoder_mod._build_device_stage(
    H, W, cfg.subsampling, (qt_l.tobytes(), qt_c.tobytes()), False)
img = jnp.asarray(arr)
out = [np.asarray(c) for c in stage(img)]  # warm
fs = []
for _ in range(7):
    t0 = time.perf_counter()
    out = stage(img)
    _ = np.asarray(out[0][:1, :1])
    fs.append(time.perf_counter() - t0)
t = float(np.median(ts)); f = float(np.median(fs))
print(json.dumps({
    "encode_ms": round(t * 1e3, 2),
    "encode_mps": round(H * W / t / 1e6, 2),
    "encode_fdct_ms": round(f * 1e3, 2),
    "encode_bytes": len(data),
}))
"""
    try:
        r = subprocess.run(
            [sys.executable, "-c", script],
            timeout=600, capture_output=True, text=True,
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
            cwd=Path(__file__).resolve().parent,
        )
        if r.returncode == 0:
            return json.loads(r.stdout.strip().splitlines()[-1])
        log(f"encode bench failed (rc={r.returncode}): {r.stderr[-500:]}")
    except Exception as e:
        log(f"encode bench skipped: {e}")
    return None


def _probe_device(timeout_s: int = 120) -> bool:
    """The axon TPU tunnel can hang indefinitely (observed: even
    jax.devices() blocks). Probe it in a subprocess with a timeout so an
    infrastructure outage degrades the bench instead of hanging it."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((8, 8)) * 2).sum()))"],
            timeout=timeout_s, capture_output=True, text=True,
            env=os.environ,
        )
        return r.returncode == 0 and "128.0" in r.stdout
    except Exception:
        return False


def _scaling_artifacts() -> None:
    """CPU-mesh scaling artifacts (SCALING.json): benchmarks/scaling.py on
    the virtual 8-device mesh plus the sharding-overhead-isolated curves
    (benchmarks/weak_scaling.py), merged. Runs UNCONDITIONALLY — including
    when the TPU tunnel is down — so the artifact never goes stale just
    because the device stage was unmeasurable (r3 verdict item 4)."""
    if os.environ.get("JDT_BENCH_NO_SCALING"):
        return
    import subprocess

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    try:
        r = subprocess.run(
            [sys.executable, "benchmarks/scaling.py",
             "--out", "SCALING.json"],
            cwd=Path(__file__).resolve().parent,
            env=env, timeout=600, capture_output=True, text=True,
        )
        if r.returncode == 0:
            log("scaling artifact: SCALING.json written")
        else:
            log(f"scaling artifact FAILED (rc={r.returncode}):\n"
                f"{r.stderr[-1000:]}")
        # Sharding-overhead-isolated curves (fixed total work, unsharded
        # vs sharded device program — benchmarks/weak_scaling.py); merged
        # into SCALING.json, or written as the whole artifact if
        # scaling.py failed above.
        r2 = subprocess.run(
            [sys.executable, "benchmarks/weak_scaling.py"],
            cwd=Path(__file__).resolve().parent,
            env=env, timeout=900, capture_output=True, text=True,
        )
        if r2.returncode == 0:
            root = Path(__file__).resolve().parent
            ws = json.loads(
                (root / "benchmarks" / "WEAK_SCALING.json").read_text()
            )
            sc_path = root / "SCALING.json"
            sc = (
                json.loads(sc_path.read_text())
                if r.returncode == 0 and sc_path.exists()
                else {}
            )
            sc["sharding_overhead_isolated"] = ws
            sc_path.write_text(json.dumps(sc, indent=1))
            log("weak-scaling curves merged into SCALING.json")
        else:
            log(f"weak-scaling artifact FAILED (rc={r2.returncode}):\n"
                f"{r2.stderr[-800:]}")
    except Exception as e:  # never let the artifact sink the bench
        log(f"scaling artifact skipped: {e}")


def _host_only_fallback(data: bytes) -> None:
    """TPU unreachable: measure and report the HOST stage honestly. The
    pipeline metric is px / max(t_host, t_device); the device stage
    cannot be measured today, so no pipeline value is claimed — the JSON
    carries the host rate with an explicit tpu_unreachable flag (r2
    hardware measurement of the same device stage: 5.72 ms/img EXACT,
    BENCH_r02.json, well under the host stage)."""
    from jpeg_decoder_tpu.models import decoder as decoder_mod
    from jpeg_decoder_tpu.utils.config import DecodeConfig, IdctPrecision

    cfg = DecodeConfig(idct_precision=IdctPrecision.EXACT)
    px = W * H
    pool = decoder_mod.PlanePool()
    frame, planes, qts = decoder_mod.host_decode(data, cfg, pool)  # warm
    pool.release(planes)
    t_host = []
    for _ in range(31):
        t0 = time.perf_counter()
        frame, planes, qts = decoder_mod.host_decode(data, cfg, pool)
        t_host.append(time.perf_counter() - t0)
        pool.release(planes)
    t_host_m = float(np.median(t_host))
    rate = px / t_host_m
    log(f"TPU tunnel unreachable — host stage only: {t_host_m*1e3:.1f} ms")
    t_nodri = _host_decode_ms(make_input_nodri())
    log(f"no-DRI host stage: {t_nodri*1e3:.1f} ms "
        f"({t_nodri/t_host_m:.2f}x DRI)")
    result = {
        "metric": "decode_4k420_q85_throughput",
        "value": round(rate / 1e6, 2),
        "unit": "MP/s",
        "vs_baseline": round(rate / 1e6 / BASELINE_MPS, 2),
        "host_ms": round(t_host_m * 1e3, 2),
        "nodri_host_ms": round(t_nodri * 1e3, 2),
        "tpu_unreachable": True,
        "note": ("device stage unmeasurable (axon tunnel down); value is "
                 "the measured HOST stage rate, which bounded the r2 "
                 "pipeline (device EXACT 5.72 ms/img < host, "
                 "BENCH_r02.json)"),
    }
    _scaling_artifacts()
    enc = _bench_encode_subprocess()
    if enc:
        result.update(enc)
        log(f"encode: {enc['encode_ms']} ms = {enc['encode_mps']} MP/s "
            f"(FDCT stage {enc['encode_fdct_ms']} ms, host CPU)")
    print(json.dumps(result))


def main() -> None:
    data = make_input()
    if not _probe_device():
        _host_only_fallback(data)
        return

    import jax
    import jax.numpy as jnp

    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.models import decoder as decoder_mod
    from jpeg_decoder_tpu.utils.config import DecodeConfig, IdctPrecision

    dev = jax.devices()[0]
    log(f"bench device: {dev.platform}/{dev.device_kind}; file {len(data)/1e6:.1f} MB")

    # EXACT precision: bit-exact vs the reference decoder ON DEVICE
    # (verified 0-mismatch on real TPU for this exact workload).
    cfg = DecodeConfig(idct_precision=IdctPrecision.EXACT)
    px = W * H

    # ---- Stage 1: host (fused header-cache + prescan + entropy decode) ----
    # Steady-state serving measurement: host_decode is the serving host
    # stage (round 4: one native call fuses the prescan with the
    # segment-parallel decode; the header prefix parse is content-cached),
    # with coefficient planes from the reuse pool as BatchDecoder uses.
    structure = parse(data, cfg)  # untimed: stage-key + segment count log
    pool = decoder_mod.PlanePool()
    frame, planes, qts = decoder_mod.host_decode(data, cfg, pool)  # warm
    pool.release(planes)
    t_host = []
    for _ in range(31):
        t0 = time.perf_counter()
        frame, planes, qts = decoder_mod.host_decode(data, cfg, pool)
        t_host.append(time.perf_counter() - t0)
        pool.release(planes)
    # Median over 31 runs: comparable with the baseline and prior rounds
    # (all medians); the shared-host noise band is reported alongside.
    # The sample is sized for the shared VM's bursty tenancy noise
    # (p25-p75 spans ~2 ms on a bad day).
    t_host_m = float(np.median(t_host))
    log(f"host stage noise band: p25={np.percentile(t_host, 25)*1e3:.1f} "
        f"p75={np.percentile(t_host, 75)*1e3:.1f} ms")
    log(f"host stage: {t_host_m*1e3:.1f} ms = {px/t_host_m/1e6:.1f} MP/s "
        f"(segments={structure.scans[0].span.num_segments})")

    # ---- Stage 2: device (fused dequant+IDCT+upsample+color) --------------
    # Per-image device time via the batch-slope method: time a B=1 and a
    # B=BIG vmapped dispatch (each synced by a tiny fetch) and take
    # (t_big - t_1) / (BIG - 1); dispatch/tunnel latency cancels out.
    from jpeg_decoder_tpu.parallel.batch import _batched_stage

    frame = structure.frame
    key = decoder_mod._stage_key(
        frame, decoder_mod.qt_by_comp_bytes(frame, qts), cfg
    )
    ncs = frame.ncs
    big = 16

    def timed_batch(b, k):
        stg = _batched_stage(k, None, ncs)
        arrs = [
            jax.device_put(jnp.asarray(np.stack([planes.plane(ci)] * b)))
            for ci in range(ncs)
        ]
        rgb = stg(*arrs)
        _ = np.asarray(jax.device_get(rgb[0, :1, :1]))  # warm + sync
        ts = []
        for _i in range(5):
            t0 = time.perf_counter()
            rgb = stg(*arrs)
            _ = np.asarray(jax.device_get(rgb[0, :1, :1]))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), rgb

    t1, rgb1 = timed_batch(1, key)
    tb, _ = timed_batch(big, key)
    slope = (tb - t1) / (big - 1)
    # FLOAT32 throughput tier (slope only; the EXACT guard below still
    # gates the whole bench).
    f32_mps = None
    try:
        cfg_f32 = cfg.replace(idct_precision=IdctPrecision.FLOAT32)
        key_f32 = decoder_mod._stage_key(
            frame, decoder_mod.qt_by_comp_bytes(frame, qts), cfg_f32
        )
        f1, _ = timed_batch(1, key_f32)
        fb, _ = timed_batch(big, key_f32)
        fslope = (fb - f1) / (big - 1)
        if fslope > 0:
            f32_mps = px / fslope / 1e6
            log(f"device stage FLOAT32 tier: {fslope*1e3:.2f} ms/img = "
                f"{f32_mps:.0f} MP/s")
    except Exception as e:
        log(f"FLOAT32 tier measurement skipped: {e}")
    if slope <= 0:
        # Per-image compute is below dispatch-latency noise; fall back to
        # the conservative upper bound of amortized batch time.
        t_dev_m = tb / big
        log(f"device stage: t1={t1*1e3:.1f} ms, t{big}={tb*1e3:.1f} ms; "
            f"compute below latency noise, bound {t_dev_m*1e3:.1f} ms/img "
            f">= {px/t_dev_m/1e6:.0f} MP/s")
    else:
        t_dev_m = slope
        log(f"device stage: t1={t1*1e3:.1f} ms, t{big}={tb*1e3:.1f} ms -> "
            f"{t_dev_m*1e3:.2f} ms/img = {px/t_dev_m/1e6:.0f} MP/s")

    # Correctness guard: EXACT mode must match the host oracle path bitwise.
    # A mismatch is a hard failure — a throughput number for a decoder that
    # produces wrong pixels must never look like a valid result.
    dev_rgb = np.asarray(jax.device_get(rgb1[0]))
    ref = decoder_mod.decode(data, cfg.replace(use_device=False))
    bit_exact = bool(np.array_equal(dev_rgb, ref.rgb))
    if not bit_exact:
        d = np.abs(dev_rgb.astype(int) - ref.rgb.astype(int))
        log(f"ERROR: device/host mismatch max={d.max()} frac={(d > 0).mean()}")

    _scaling_artifacts()

    t_nodri = _host_decode_ms(make_input_nodri())
    log(f"no-DRI host stage: {t_nodri*1e3:.1f} ms "
        f"({t_nodri/t_host_m:.2f}x DRI)")

    rate = px / max(t_host_m, t_dev_m)
    result = {
        "metric": "decode_4k420_q85_throughput",
        "value": round(rate / 1e6, 2),
        "unit": "MP/s",
        "vs_baseline": round(rate / 1e6 / BASELINE_MPS, 2),
        "host_ms": round(t_host_m * 1e3, 2),
        "nodri_host_ms": round(t_nodri * 1e3, 2),
        "device_exact_ms": round(t_dev_m * 1e3, 2),
    }
    if f32_mps is not None:
        result["device_f32_mps"] = round(f32_mps, 0)
    enc = _bench_encode_subprocess()
    if enc:
        result.update(enc)
        log(f"encode: {enc['encode_ms']} ms = {enc['encode_mps']} MP/s "
            f"(FDCT stage {enc['encode_fdct_ms']} ms, host CPU)")
    if not bit_exact:
        result["value"] = 0.0
        result["vs_baseline"] = 0.0
        result["bit_exact"] = False
    print(json.dumps(result))
    if not bit_exact:
        sys.exit(1)


if __name__ == "__main__":
    main()
