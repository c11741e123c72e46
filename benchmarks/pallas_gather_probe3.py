"""Probe round 3: tpu.dynamic_gather forms (via take_along_axis with
FULL-shape indices — the Mosaic contract is indices.shape == operand.shape)
plus fori_loop overhead scaling. These four numbers decide the device
entropy kernel's architecture:

  G1  lane crossbar  [8,128]   — per-row 128-entry LUT
  G2  sublane gather [512,128] — per-lane (column) window fetch
  G3  sublane gather [4096,128]— does cost scale with operand height?
  G4  loop-body scaling        — fixed fori_loop overhead vs per-op cost
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
    for _ in range(7):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out.reshape(-1)[:1]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def probe(name, build, s1=256, s2=4096):
    try:
        fn1, args = build(s1)
        fn2, _ = build(s2)
        t1 = run_once(fn1, args)
        t2 = run_once(fn2, args)
        ns = (t2 - t1) / (s2 - s1) * 1e9
        log(f"[{name}] COMPILED: slope {ns:.1f} ns/step "
            f"(t{s1}={t1*1e3:.1f}ms t{s2}={t2*1e3:.1f}ms)")
    except Exception as e:
        log(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:250]}")
        traceback.print_exc(limit=3)


def _gather_kernel(shape, axis, steps):
    R, C = shape
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


def build_g1(steps):
    return _gather_kernel((8, 128), 1, steps)


def build_g2(steps):
    return _gather_kernel((512, 128), 0, steps)


def build_g3(steps):
    return _gather_kernel((4096, 128), 0, steps)


def _vshift_kernel(n_ops, steps):
    def kernel(x_ref, s_ref, out_ref):
        sh = s_ref[...]

        def body(i, x):
            for k in range(n_ops):
                x = ((x >> ((sh + i + k) & 31).astype(jnp.uint32)) ^ x) + 1
            return x

        out_ref[...] = jax.lax.fori_loop(0, steps, body, x_ref[...])

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.integers(0, 2**32, (8, 128), dtype=np.uint32))
    sh = jnp.asarray(rng.integers(0, 32, (8, 128), dtype=np.uint32))
    return fn, (x, sh)


def build_g4a(steps):
    return _vshift_kernel(1, steps)


def build_g4b(steps):
    return _vshift_kernel(10, steps)


if __name__ == "__main__":
    for name, build in [
        ("G1 crossbar 8x128 ax1", build_g1),
        ("G2 sublane 512x128 ax0", build_g2),
        ("G3 sublane 4096x128 ax0", build_g3),
        ("G4a loop body x1", build_g4a),
        ("G4b loop body x10", build_g4b),
    ]:
        probe(name, build)
