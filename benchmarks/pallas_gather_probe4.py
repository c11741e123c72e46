"""Probe round 4 — the decisive numbers for the device entropy kernel.

  H1 [8,128]  axis-0 gather  — in-vreg sublane shuffle (refill primitive)
  H2 [32,128] axis-0 gather  — does operand height scale?
  H3 [128,128] axis-1 gather — per-row window crossbar
  H4 realistic symbol step   — 2 crossbars + compare ladder + bit math
  H5 per-lane dynamic-offset DMA (HBM->VMEM), 128 issues per call

Chains are 4096 vs 32768 steps so compute dwarfs the ~30 ms axon dispatch.
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_once(fn, args):
    out = fn(*args)
    np.asarray(jax.device_get(out.reshape(-1)[:1]))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out.reshape(-1)[:1]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def probe(name, build, s1=4096, s2=32768):
    try:
        fn1, args = build(s1)
        fn2, _ = build(s2)
        t1 = run_once(fn1, args)
        t2 = run_once(fn2, args)
        ns = (t2 - t1) / (s2 - s1) * 1e9
        log(f"[{name}] COMPILED: slope {ns:.1f} ns/step "
            f"(t{s1}={t1*1e3:.1f}ms t{s2}={t2*1e3:.1f}ms)")
    except Exception as e:
        log(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}")


def _gather_kernel(shape, axis, steps):
    size = shape[axis]

    def kernel(tab_ref, idx0_ref, out_ref):
        tab = tab_ref[...]

        def body(i, idx):
            v = jnp.take_along_axis(tab, idx, axis=axis)
            return (v + i) % size

        out_ref[...] = jax.lax.fori_loop(0, steps, body, idx0_ref[...])

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    rng = np.random.default_rng(size)
    tab = jnp.asarray(rng.integers(0, size, shape, dtype=np.int32))
    idx0 = jnp.asarray(rng.integers(0, size, shape, dtype=np.int32))
    return fn, (tab, idx0)


def build_h1(steps):
    return _gather_kernel((8, 128), 0, steps)


def build_h2(steps):
    return _gather_kernel((32, 128), 0, steps)


def build_h3(steps):
    return _gather_kernel((128, 128), 1, steps)


def build_h4(steps):
    """Realistic per-symbol body: 16-entry compare ladder (vector vs scalar
    thresholds), two [8,128] crossbar lookups, EXTEND bit math, variable
    shifts — all on [8,128] lane state."""
    rng = np.random.default_rng(44)
    thr = jnp.asarray(rng.integers(0, 1 << 16, (1, 16), dtype=np.int32))
    symtab = jnp.asarray(rng.integers(0, 256, (8, 128), dtype=np.int32))

    def kernel(thr_ref, sym_ref, st_ref, out_ref):
        sym = sym_ref[...]

        def body(i, st):
            bitbuf, bitcnt, acc = st
            code16 = (bitbuf >> 16).astype(jnp.int32)
            # length ladder: len = 1 + sum(code16 > thr[l])
            ln = jnp.ones_like(code16)
            for l in range(16):
                ln = ln + (code16 > thr_ref[0, l]).astype(jnp.int32)
            ln = jnp.minimum(ln, 16)
            off = (code16 >> (16 - ln).astype(jnp.uint32)) & 0x3FF
            # two-stage 1024-entry lookup: crossbar by low 7, sublane by hi 3
            lo = off & 127
            hi = (off >> 7) & 7
            row = jnp.take_along_axis(sym, lo, axis=1)
            s = jnp.take_along_axis(row, hi, axis=0)
            size = s & 0xF
            ext = (bitbuf >> (32 - ln - size).astype(jnp.uint32)).astype(
                jnp.int32
            ) & ((1 << size) - 1)
            half = jnp.where(size > 0, 1 << jnp.maximum(size - 1, 0), 0)
            val = jnp.where(ext < half, ext - 2 * half + 1, ext)
            used = (ln + size).astype(jnp.uint32)
            bitbuf = bitbuf << used
            bitcnt = bitcnt - (ln + size)
            need = bitcnt < 16
            bitbuf = bitbuf | jnp.where(need, jnp.uint32(0x5A5A), 0)
            bitcnt = jnp.where(need, bitcnt + 16, bitcnt)
            return (bitbuf, bitcnt, acc ^ val)

        st = (
            jnp.full((8, 128), 0x9E3779B9, jnp.uint32),
            jnp.full((8, 128), 32, jnp.int32),
            jnp.zeros((8, 128), jnp.int32),
        )
        bitbuf, bitcnt, acc = jax.lax.fori_loop(0, steps, body, st)
        out_ref[...] = acc + bitcnt + bitbuf.astype(jnp.int32)

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    st0 = jnp.zeros((8, 128), jnp.int32)
    return fn, (thr, symtab, st0)


def build_h5(steps):
    """Per-lane dynamic-offset DMA: each 'refill wave' issues 128 separate
    HBM->VMEM copies at data-dependent row offsets, then waits. steps here
    = number of individual DMAs (issued in waves of 128)."""
    waves = max(1, steps // 128)
    H = 4096
    stream = jnp.asarray(
        np.random.default_rng(55).integers(0, 2**20, (H, 64), dtype=np.int32)
    )

    def kernel(stream_hbm, off0_ref, out_ref):
        def run(window, sems):
            def wave(w, off):
                def issue(c, _):
                    pltpu.make_async_copy(
                        stream_hbm.at[pl.ds(((off[0, c % 128] + c) % (H - 8)), 8), :],
                        window.at[pl.ds((c % 16) * 8, 8), :],
                        sems.at[c % 16],
                    ).start()
                    return 0

                jax.lax.fori_loop(0, 128, issue, 0)

                def wait(c, _):
                    pltpu.make_async_copy(
                        stream_hbm.at[pl.ds(0, 8), :],
                        window.at[pl.ds((c % 16) * 8, 8), :],
                        sems.at[c % 16],
                    ).wait()
                    return 0

                jax.lax.fori_loop(0, 128, wait, 0)
                return off + 1

            off = jax.lax.fori_loop(0, waves, wave, off0_ref[...])
            out_ref[...] = off + window[0, 0]

        pl.run_scoped(
            run,
            window=pltpu.VMEM((128, 64), jnp.int32),
            sems=pltpu.SemaphoreType.DMA((16,)),
        )

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )
    )
    off0 = jnp.asarray(
        np.random.default_rng(56).integers(0, H - 300, (1, 128), dtype=np.int32)
    )
    return fn, (stream, off0)


if __name__ == "__main__":
    for name, build in [
        ("H1 sublane 8x128 ax0", build_h1),
        ("H2 sublane 32x128 ax0", build_h2),
        ("H3 crossbar 128x128 ax1", build_h3),
        ("H4 realistic symbol step", build_h4),
        ("H5 per-lane DMA", build_h5),
    ]:
        probe(name, build)
