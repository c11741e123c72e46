"""Batch data-parallel decode/encode over a device mesh.

The serving shape: many JPEGs per step. Host threads run the native
segment-parallel entropy stage concurrently (the ctypes call releases the
GIL), coefficient planes stack into [B, by, bx, 64] batches, and ONE jitted
vmapped device program — sharded over the mesh "data" axis — does
dequant+IDCT+upsample+color for the whole batch. The whole-file independence
seam is the reference's decode_jpeg_buffer unit
(/root/reference/src/decode.c:138); everything else here is new design.
"""

from __future__ import annotations

import concurrent.futures as cf
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models import decoder as decoder_mod
from ..models.decoder import _stage_key, build_stage_raw, qt_by_comp_bytes
from ..utils.config import DecodeConfig, EntropyBackend
from ..utils.errors import JpegFormatError
from ..utils.metrics import GLOBAL_METRICS as metrics
from ..io.parser import parse
from . import mesh as mesh_mod


@functools.lru_cache(maxsize=128)
def _batched_stage(key, mesh: Mesh | None, ncs: int):
    """jit(vmap(stage)) with batch sharding over the mesh's data axis."""
    raw = build_stage_raw(key)
    rgb_only = lambda *planes: raw(*planes)[0]  # noqa: E731
    batched = jax.vmap(rgb_only)
    if mesh is None:
        return jax.jit(batched)
    sh = mesh_mod.batch_sharding(mesh)
    return jax.jit(
        batched, in_shardings=(sh,) * ncs, out_shardings=sh
    )


class BatchDecoder:
    """Same-geometry batch decoder (compile once, stream batches through)."""

    def __init__(self, cfg: DecodeConfig | None = None, mesh: Mesh | None = None):
        self.cfg = cfg or DecodeConfig()
        self.mesh = mesh
        self._pool = decoder_mod.PlanePool()

    @property
    def _n_data(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.shape[mesh_mod.DATA_AXIS]

    def _host_many(self, datas):
        """Host stage for a batch of raw streams: (frame, planes, qts)
        triples via the FUSED path (cached header parse + one native
        prescan+decode call per image — decoder.host_decode), images
        across host threads. The Pallas backend keeps the structure-based
        route (its lane packing needs parsed scans)."""
        workers = self.cfg.num_threads or os.cpu_count() or 1
        if self.cfg.entropy_backend == EntropyBackend.PALLAS:
            structures = [parse(d, self.cfg) for d in datas]
            results = self._entropy_many_pallas(structures, workers)
            return [
                (s.frame, p, q)
                for s, (p, q) in zip(structures, results)
            ]

        def one(d):
            return decoder_mod.host_decode(d, self.cfg, self._pool)

        with metrics.timer("entropy_batch", items=len(datas)):
            if workers == 1 or len(datas) == 1:
                return [one(d) for d in datas]
            with cf.ThreadPoolExecutor(max_workers=workers) as pool:
                return list(pool.map(one, datas))

    def _entropy_many_pallas(self, structures, workers):
        """Device-resident entropy for the whole batch: every batchable
        member's restart segments pack into shared G=8 Pallas invocations
        (ops.entropy_pallas.entropy_decode_batch — lanes are image-agnostic,
        so eight 135-segment 4K images fill 1080 of 1024+ lanes instead of
        eight half-occupied kernels). Members the lockstep kernel cannot
        hold (progressive, restart-free, oversized segments) fall back to
        the native host path per image — honestly, not by failing the
        batch."""
        import dataclasses

        from ..ops import entropy_pallas

        results: list = [None] * len(structures)
        batch_idx = [
            i for i, s in enumerate(structures) if entropy_pallas.batchable(s)
        ]
        if batch_idx:
            with metrics.timer("entropy_pallas_batch", items=len(batch_idx)):
                outs = entropy_pallas.entropy_decode_batch(
                    [structures[i] for i in batch_idx], self.cfg
                )
            for i, r in zip(batch_idx, outs):
                results[i] = r
        rest = [i for i in range(len(structures)) if results[i] is None]
        if rest:
            host_cfg = dataclasses.replace(
                self.cfg, entropy_backend=EntropyBackend.NATIVE
            )

            def one(i):
                s = structures[i]
                planes = self._pool.acquire(s)
                return i, decoder_mod._entropy_decode(s, host_cfg, planes)

            with metrics.timer("entropy_batch_fallback", items=len(rest)):
                if workers == 1 or len(rest) == 1:
                    done = [one(i) for i in rest]
                else:
                    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
                        done = list(pool.map(one, rest))
            for i, r in done:
                results[i] = r
        return results

    def decode_batch(self, datas: list[bytes]) -> np.ndarray:
        """Decode a batch of SAME-GEOMETRY JPEGs -> [B, H, W, 3] uint8."""
        if not datas:
            return np.zeros((0, 0, 0, 3), dtype=np.uint8)
        return self._device_batch(self._host_many(datas))

    def decode_stream(self, datas, batch_size: int | None = None):
        """Pipelined streaming decode: yields [B, H, W, 3] arrays per batch.

        While the device runs batch k, host threads already run the
        parse+entropy stage of batch k+1 — the two pipeline stages overlap
        in steady state, so sustained throughput approaches the slower
        stage's rate rather than their sum. Same-geometry inputs assumed
        (use decode_many for mixed)."""
        import itertools

        batch_size = batch_size or max(self._n_data, 1) * 2
        it = iter(datas)

        with cf.ThreadPoolExecutor(max_workers=1) as prefetcher:
            pending = None
            while True:
                chunk = list(itertools.islice(it, batch_size))
                nxt = (
                    prefetcher.submit(self._host_many, chunk)
                    if chunk else None
                )
                if pending is not None:
                    yield self._device_batch(pending.result())
                pending = nxt
                if pending is None:
                    return

    def _device_batch(self, results) -> np.ndarray:
        """Device stage over pre-run host results: (frame, planes, qts)
        triples, one per image."""
        keys = set()
        for frame, _planes, qts in results:
            keys.add(
                _stage_key(frame, qt_by_comp_bytes(frame, qts), self.cfg)
            )
        if len(keys) != 1:
            raise JpegFormatError(
                "decode_stream needs identical geometry/tables across inputs"
            )
        (key,) = keys
        frame = results[0][0]
        b = len(results)
        n_data = self._n_data
        pad = (-b) % n_data
        batches = [
            jnp.asarray(
                np.stack(
                    [results[i][1].plane(ci) for i in range(b)]
                    + [results[b - 1][1].plane(ci)] * pad
                )
            )
            for ci in range(frame.ncs)
        ]
        # np.stack copied the coefficients; the per-image planes can go
        # back to the pool for the next batch.
        for _frame, planes, _qts in results:
            self._pool.release(planes)
        stage = _batched_stage(key, self.mesh, frame.ncs)
        with metrics.timer("device_batch", items=b):
            rgb = np.asarray(jax.device_get(stage(*batches)))
        return rgb[:b]

    def decode_many(self, datas: list[bytes]) -> list[np.ndarray]:
        """Decode a mixed batch: groups by geometry/table signature, one
        batched dispatch per group; returns per-input RGB arrays in input
        order. Inputs are parsed once (structures are reused for the
        grouped device dispatch)."""
        structures = [parse(d, self.cfg) for d in datas]
        order: dict = {}
        for i, s in enumerate(structures):
            # The full stage signature: frame geometry AND the quant-table
            # contents in force for each scan (same-geometry images at
            # different qualities must not share a device program).
            key = (
                s.frame,
                tuple(
                    (
                        sc.header,
                        sc.restart_interval,
                        tuple(
                            (tid, qt.values.tobytes())
                            for tid, qt in sorted(sc.quant_tables.items())
                        ),
                    )
                    for sc in s.scans
                ),
            )
            order.setdefault(key, []).append(i)
        out: list = [None] * len(datas)
        for idxs in order.values():
            # Per-group host stage re-enters through the fused path (the
            # grouping parse above hit the header caches, so the re-walk
            # is cheap) and one batched device dispatch per group.
            rgbs = self._device_batch(
                self._host_many([datas[i] for i in idxs])
            )
            for j, i in enumerate(idxs):
                out[i] = rgbs[j]
        return out


def decode_batch(
    datas: list[bytes],
    cfg: DecodeConfig | None = None,
    mesh: Mesh | None = None,
) -> np.ndarray:
    return BatchDecoder(cfg, mesh).decode_batch(datas)
