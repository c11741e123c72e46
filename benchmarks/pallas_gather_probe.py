"""Probe: which dynamic-indexing primitives does Mosaic support on this
TPU, and how fast are they? The device entropy kernel's design hinges on
(a) per-lane LUT lookup and (b) per-lane bitstream word fetch; this probes
each candidate lowering so the kernel uses the fastest one that compiles.

Run on the real chip (compiles go through the axon relay; expect minutes).
Each probe prints COMPILED/FAILED plus a steady-state ns/step estimate from
a fori_loop of dependent iterations (serial chain, like the decoder's).
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


STEPS = 256  # serial chain length per kernel invocation


def time_kernel(fn, *args):
    out = fn(*args)
    np.asarray(jax.device_get(out.reshape(-1)[:1]))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out.reshape(-1)[:1]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def probe(name, build):
    try:
        fn, args = build()
        t = time_kernel(fn, *args)
        log(f"[{name}] COMPILED: {t*1e3:.2f} ms / {STEPS} steps = "
            f"{t/STEPS*1e9:.0f} ns/step")
    except Exception as e:
        tb = traceback.format_exc(limit=2)
        log(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}\n{tb[-500:]}")


# --- E1: shared-table gather via jnp.take (4096-entry LUT, [8,128] idx) ---
def build_e1():
    table = jnp.arange(4096, dtype=jnp.int32)

    def kernel(tab_ref, idx0_ref, out_ref):
        def body(i, idx):
            v = jnp.take(tab_ref[0], idx.reshape(-1), axis=0).reshape(8, 128)
            return (v + idx + i) & 0xFFF

        out_ref[...] = jax.lax.fori_loop(0, STEPS, body, idx0_ref[...])

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    idx0 = jnp.asarray(
        np.random.default_rng(0).integers(0, 4096, (8, 128), dtype=np.int32)
    )
    return fn, (table.reshape(1, 4096), idx0)


# --- E2: per-row gather: words [128, W] along axis=1, per-row index -------
def build_e2():
    W = 2048
    words = jnp.asarray(
        np.random.default_rng(1).integers(0, 2**20, (128, W), dtype=np.int32)
    )

    def kernel(words_ref, idx0_ref, out_ref):
        def body(i, idx):
            v = jnp.take_along_axis(words_ref[...], idx[:, None], axis=1)[:, 0]
            return (v + idx + i) % W

        out_ref[...] = jax.lax.fori_loop(
            0, STEPS, body, idx0_ref[...].reshape(128)
        ).reshape(1, 128)

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    idx0 = jnp.asarray(
        np.random.default_rng(2).integers(0, W, (1, 128), dtype=np.int32)
    )
    return fn, (words, idx0)


# --- E3: one-hot bilinear gather (64x64 table via two MXU-friendly ops) ---
def build_e3():
    tab = jnp.asarray(
        np.random.default_rng(3).integers(0, 1 << 13, (64, 64)).astype(np.float32)
    )

    def kernel(tab_ref, idx0_ref, out_ref):
        iota64 = jax.lax.broadcasted_iota(jnp.int32, (128, 64), 1)

        def body(i, idx):
            hi = (idx >> 6)[:, None]
            lo = (idx & 63)[:, None]
            oh_hi = (iota64 == hi).astype(jnp.float32)
            oh_lo = (iota64 == lo).astype(jnp.float32)
            rows = jnp.dot(oh_hi, tab_ref[...],
                           preferred_element_type=jnp.float32)
            v = jnp.sum(rows * oh_lo, axis=1).astype(jnp.int32)
            return (v + idx + i) & 0xFFF

        out_ref[...] = jax.lax.fori_loop(
            0, STEPS, body, idx0_ref[...].reshape(128)
        ).reshape(1, 128)

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    idx0 = jnp.asarray(
        np.random.default_rng(4).integers(0, 4096, (1, 128), dtype=np.int32)
    )
    return fn, (tab, idx0)


# --- E4: 16-bit one-hot bilinear (256x256 table, the uniform-decode size) -
def build_e4():
    tab = jnp.asarray(
        np.random.default_rng(5).integers(0, 1 << 13, (256, 256)).astype(np.float32)
    )

    def kernel(tab_ref, idx0_ref, out_ref):
        iota256 = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)

        def body(i, idx):
            hi = (idx >> 8)[:, None]
            lo = (idx & 255)[:, None]
            oh_hi = (iota256 == hi).astype(jnp.float32)
            oh_lo = (iota256 == lo).astype(jnp.float32)
            rows = jnp.dot(oh_hi, tab_ref[...],
                           preferred_element_type=jnp.float32)
            v = jnp.sum(rows * oh_lo, axis=1).astype(jnp.int32)
            return (v + idx + i) & 0xFFFF

        out_ref[...] = jax.lax.fori_loop(
            0, STEPS, body, idx0_ref[...].reshape(256)
        ).reshape(2, 128)

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    idx0 = jnp.asarray(
        np.random.default_rng(6).integers(0, 65536, (2, 128), dtype=np.int32)
    )
    return fn, (tab, idx0)


# --- E5: per-row dynamic scatter: out[i, idx[i]] = v ----------------------
def build_e5():
    W = 512

    def kernel(idx0_ref, out_ref):
        def body(i, idx):
            rows = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)
            # scatter one value per row at a dynamic column
            upd = jnp.zeros((128, W), jnp.int32).at[
                rows[:, 0], idx
            ].set(idx + i)
            out_ref[...] = out_ref[...] + upd
            return (idx + 7) % W

        jax.lax.fori_loop(0, STEPS, body, idx0_ref[...].reshape(128))

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    idx0 = jnp.asarray(
        np.random.default_rng(7).integers(0, W, (1, 128), dtype=np.int32)
    )
    return fn, (idx0,)


# --- E6: per-lane variable shift (needed for bit extraction) --------------
def build_e6():
    def kernel(x_ref, s_ref, out_ref):
        def body(i, x):
            sh = (s_ref[...] + i) & 31
            return ((x >> sh.astype(jnp.uint32)) ^ x) + 1

        out_ref[...] = jax.lax.fori_loop(0, STEPS, body, x_ref[...])

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(0, 2**32, (8, 128), dtype=np.uint32))
    sh = jnp.asarray(rng.integers(0, 32, (8, 128), dtype=np.uint32))
    return fn, (x, sh)


if __name__ == "__main__":
    for name, build in [
        ("E1 take shared 4096", build_e1),
        ("E2 take_along_axis rows", build_e2),
        ("E3 bilinear 64x64", build_e3),
        ("E4 bilinear 256x256", build_e4),
        ("E5 row scatter", build_e5),
        ("E6 variable shift", build_e6),
    ]:
        probe(name, build)
