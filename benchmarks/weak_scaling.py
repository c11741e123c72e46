"""Sharding-overhead-isolated scaling measurement (VERDICT r2 item 4).

The virtual CPU mesh cannot demonstrate real multi-chip scaling: all
"devices" share the host's cores, so any wall-clock-per-device curve
measures core contention, not the sharded program. What the virtual mesh
CAN measure honestly is the *sharding overhead* of the device program at
fixed total work:

    eff(N) = T(mesh=1 device, total work W) / T(mesh=N devices, same W)

Both sides run the identical FLOPs on the identical cores; the only
difference is the SPMD partitioning (layouts, collectives, per-shard
dispatch). If eff(N) stays near 1.0, the sharded program adds no
serialized or replicated work — on real chips the remaining loss is the
ICI collective time, which for these programs is zero (DP: no
collectives) or one chroma halo row per stripe boundary (SP: ppermute of
~W bytes, trivially small vs the per-stripe compute).

Measured with PRE-SHARDED device inputs (jax.device_put with the target
NamedSharding) and block_until_ready around the jitted call, so host
entropy, H2D, and re-sharding are all excluded — this is device-program
time only.

Two curves:
  * dp   — the vmapped batch stage (dequant+IDCT+upsample+color) over a
           batch sharded on the data axis; per-device work = b images.
  * sp   — the shard_map striped stage over ONE image whose height grows
           with N (fixed MCU rows per device); exercises the ppermute
           halo exchange of the fancy upsampler.

Writes benchmarks/WEAK_SCALING.json (merged into SCALING.json by
bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def _med_times_ab(fa, fb, repeat=21):
    """Interleaved A/B timing (the shared VM's noise drifts on ~100 ms
    scales, so alternating trials is the only fair comparison — the
    mesh=1 control row must read ~1.0). Returns (med_a, med_b, stats)
    where stats carries p25/p75 for both sides so a reader can judge
    whether an efficiency away from 1.0 clears the noise band."""
    fa(), fb()  # warm/compile
    fa(), fb()  # second warm: first post-compile run still pays caches
    ta, tb = [], []
    for i in range(repeat):
        # ABBA ordering: alternate which side runs first so any
        # within-pair systematic (allocator state, cache residue from the
        # previous trial) cancels instead of biasing one side — the r3
        # artifact's mesh=1 control read 0.885/1.17 purely from this.
        first, flist, second, slist = (
            (fa, ta, fb, tb) if i % 2 == 0 else (fb, tb, fa, ta)
        )
        t0 = time.perf_counter()
        jax.block_until_ready(first())
        flist.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(second())
        slist.append(time.perf_counter() - t0)
    stats = {
        "a_p25_ms": round(float(np.percentile(ta, 25)) * 1e3, 2),
        "a_p75_ms": round(float(np.percentile(ta, 75)) * 1e3, 2),
        "b_p25_ms": round(float(np.percentile(tb, 25)) * 1e3, 2),
        "b_p75_ms": round(float(np.percentile(tb, 75)) * 1e3, 2),
    }
    return float(np.median(ta)), float(np.median(tb)), stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--per-device-batch", type=int, default=4)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--rows-per-stripe", type=int, default=16,
                    help="MCU rows per stripe for the sp curve")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.models import decoder as dm, encoder
    from jpeg_decoder_tpu.parallel import batch as batch_mod
    from jpeg_decoder_tpu.parallel import mesh as mesh_mod
    from jpeg_decoder_tpu.parallel import stripes
    from jpeg_decoder_tpu.utils.config import (
        DecodeConfig, EncodeConfig, IdctPrecision,
    )

    sizes = [int(x) for x in args.sizes.split(",")
             if int(x) <= len(jax.devices())]
    cfg = DecodeConfig(idct_precision=IdctPrecision.FLOAT32)
    rng = np.random.default_rng(11)

    # ---- DP curve: batch stage, data-axis sharding -----------------------
    img = rng.integers(0, 256, (args.hw, args.hw, 3), dtype=np.uint8)
    data = encoder.encode(
        img, EncodeConfig(quality=85, subsampling="420", restart_interval=4)
    )
    s = parse(data, cfg)
    planes, qts = dm._entropy_decode(s, cfg)
    key = dm._stage_key(s.frame, dm.qt_by_comp_bytes(s.frame, qts), cfg)
    ncs = s.frame.ncs

    dp_records = []
    for n in sizes:
        b = args.per_device_batch * n  # total work scales with N...
        mesh1 = mesh_mod.make_mesh(n_data=1, devices=jax.devices()[:1])
        meshn = mesh_mod.make_mesh(n_data=n, devices=jax.devices()[:n])
        batches = [
            np.broadcast_to(
                planes.plane(ci), (b,) + planes.plane(ci).shape
            ).copy()
            for ci in range(ncs)
        ]
        stage1 = batch_mod._batched_stage(key, mesh1, ncs)
        sh1 = mesh_mod.batch_sharding(mesh1)
        arrs1 = [jax.device_put(a, sh1) for a in batches]
        stagen = batch_mod._batched_stage(key, meshn, ncs)
        shn = mesh_mod.batch_sharding(meshn)
        arrsn = [jax.device_put(a, shn) for a in batches]
        tu, ts_, stats = _med_times_ab(lambda: stage1(*arrs1),
                                       lambda: stagen(*arrsn))
        rec = {
            "mesh_devices": n,
            "total_images": b,
            "t_unsharded_ms": round(tu * 1e3, 2),
            "t_sharded_ms": round(ts_ * 1e3, 2),
            "sharding_efficiency": round(tu / ts_, 3),
        }
        rec.update(stats)
        if n == 1:
            rec["control"] = True  # identical program both sides: ~1.0
        elif tu / ts_ > 1.05:
            rec["note"] = (
                "efficiency > 1 is a host-threading artifact of the "
                "virtual CPU mesh: XLA:CPU dispatches the N per-shard "
                "executables concurrently (one runtime stream per "
                "virtual device) while the 1-device program runs as a "
                "single executable with less cross-op overlap; real "
                "chips cannot exceed 1.0 this way"
            )
        dp_records.append(rec)
        print(json.dumps(rec), flush=True)

    # ---- SP curve: striped stage, fixed MCU rows per stripe --------------
    sp_records = []
    for n in sizes:
        h = args.rows_per_stripe * 16 * n  # 4:2:0 MCU = 16 rows
        img = rng.integers(0, 256, (h, args.hw, 3), dtype=np.uint8)
        data = encoder.encode(
            img,
            EncodeConfig(quality=85, subsampling="420",
                         restart_interval=args.hw // 16),
        )
        scfg = cfg.replace(upsample="fancy")  # exercise the halo exchange
        s = parse(data, scfg)
        planes, qts = dm._entropy_decode(s, scfg)
        key = dm._stage_key(s.frame, dm.qt_by_comp_bytes(s.frame, qts), scfg)
        prepared = []
        for nst in (1, n):
            mesh = mesh_mod.make_mesh(
                n_data=1, n_stripe=nst, devices=jax.devices()[:nst]
            )
            stage = stripes.build_striped_stage(key, mesh, nst)
            sh = mesh_mod.stripe_sharding(mesh)
            arrs = [
                jax.device_put(np.asarray(planes.plane(ci)), sh)
                for ci in range(s.frame.ncs)
            ]
            prepared.append((stage, arrs))
        (st1, a1), (stn, an) = prepared
        tu, ts_, stats = _med_times_ab(lambda: st1(*a1), lambda: stn(*an))
        rec = {
            "mesh_devices": n,
            "height_px": h,
            "t_unsharded_ms": round(tu * 1e3, 2),
            "t_sharded_ms": round(ts_ * 1e3, 2),
            "sharding_efficiency": round(tu / ts_, 3),
        }
        rec.update(stats)
        if n == 1:
            rec["control"] = True  # identical partitioning both sides
        sp_records.append(rec)
        print(json.dumps(rec), flush=True)

    result = {
        "platform": jax.devices()[0].platform,
        "methodology": (
            "fixed TOTAL work, unsharded (1-device) vs sharded (N-device) "
            "device-program time, pre-sharded inputs, block_until_ready; "
            "efficiency = t_unsharded / t_sharded. On the shared-core "
            "virtual mesh this isolates SPMD partitioning overhead "
            "(layouts, collectives, per-shard dispatch) from compute; "
            "~1.0 means the sharded program adds no serialized or "
            "replicated work, so real-chip scaling is bounded only by "
            "ICI collective time (DP: none; SP: one ppermuted chroma "
            "halo row per boundary)."
        ),
        "dp_batch_stage": dp_records,
        "sp_striped_stage": sp_records,
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "WEAK_SCALING.json"
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"written": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
