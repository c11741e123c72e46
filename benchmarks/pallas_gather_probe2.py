"""Probe round 2: 2-D dynamic gathers in Mosaic + honest per-step timing.

Round-1 findings (pallas_gather_probe.py): 1-D take fails with "Only 2D
gather is supported" (so 2-D IS supported), scatter is unsupported, and a
single-invocation timing is swamped by the ~30 ms axon dispatch latency.
Here every probe is built at two serial-chain lengths and the per-step cost
is the slope between them.
"""

from __future__ import annotations

import functools
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
        tb = traceback.format_exc(limit=2)
        log(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:250]}\n{tb[-400:]}")


# --- P1: LUT gather along LANES: table [8, 4096], idx [8, 128] ------------
def build_p1(steps):
    table = jnp.tile(jnp.arange(4096, dtype=jnp.int32)[None, :], (8, 1))

    def kernel(tab_ref, idx0_ref, out_ref):
        tab = tab_ref[...]

        def body(i, idx):
            v = jnp.take_along_axis(tab, idx, axis=1)
            return (v + i) & 0xFFF

        out_ref[...] = jax.lax.fori_loop(0, steps, body, idx0_ref[...])

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    idx0 = jnp.asarray(
        np.random.default_rng(0).integers(0, 4096, (8, 128), dtype=np.int32)
    )
    return fn, (table, idx0)


# --- P2: word fetch along SUBLANES: words [2048, 128], idx [1, 128] -------
def build_p2(steps):
    W = 2048
    words = jnp.asarray(
        np.random.default_rng(1).integers(0, 2**20, (W, 128), dtype=np.int32)
    )

    def kernel(words_ref, idx0_ref, out_ref):
        w = words_ref[...]

        def body(i, idx):
            v = jnp.take_along_axis(w, idx, axis=0)
            return (v + i) % W

        out_ref[...] = jax.lax.fori_loop(0, steps, body, idx0_ref[...])

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    idx0 = jnp.asarray(
        np.random.default_rng(2).integers(0, W, (1, 128), dtype=np.int32)
    )
    return fn, (words, idx0)


# --- P3: big word fetch along sublanes: words [16384, 128] ----------------
def build_p3(steps):
    W = 16384
    words = jnp.asarray(
        np.random.default_rng(3).integers(0, 2**20, (W, 128), dtype=np.int32)
    )

    def kernel(words_ref, idx0_ref, out_ref):
        def body(i, idx):
            v = jnp.take_along_axis(words_ref[...], idx, axis=0)
            return (v + i) % W

        out_ref[...] = jax.lax.fori_loop(0, steps, body, idx0_ref[...])

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    idx0 = jnp.asarray(
        np.random.default_rng(4).integers(0, W, (1, 128), dtype=np.int32)
    )
    return fn, (words, idx0)


# --- P4: variable shift chain (honest slope) ------------------------------
def build_p4(steps):
    def kernel(x_ref, s_ref, out_ref):
        sh = s_ref[...]

        def body(i, x):
            return ((x >> ((sh + i) & 31).astype(jnp.uint32)) ^ x) + 1

        out_ref[...] = jax.lax.fori_loop(0, steps, body, x_ref[...])

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(0, 2**32, (8, 128), dtype=np.uint32))
    sh = jnp.asarray(rng.integers(0, 32, (8, 128), dtype=np.uint32))
    return fn, (x, sh)


# --- P5: combined decoder-like step: LUT gather + shifts + word fetch -----
def build_p5(steps):
    W = 2048
    rng = np.random.default_rng(5)
    table = jnp.tile(
        jnp.asarray(rng.integers(1, 17, 4096, dtype=np.int32))[None, :], (8, 1)
    )  # fake (len) entries 1..16
    words = jnp.asarray(rng.integers(0, 2**32, (W, 128), dtype=np.uint32))

    def kernel(tab_ref, words_ref, st_ref, out_ref):
        tab = tab_ref[...]
        w = words_ref[...]

        def body(i, st):
            bitbuf, bitcnt, wordpos, acc = st
            peek = (bitbuf >> 20).astype(jnp.int32)  # 12-bit window
            e = jnp.take_along_axis(tab, peek[:1].repeat(8, 0) & 0xFFF,
                                    axis=1)[:1]
            ln = (e & 31).astype(jnp.uint32)
            bitbuf = bitbuf << ln
            bitcnt = bitcnt - ln.astype(jnp.int32)
            need = bitcnt < 16
            nxt = jnp.take_along_axis(w, wordpos % W, axis=0)
            shift_in = jnp.where(need, nxt, jnp.uint32(0))
            sh = jnp.where(need, 16, 0).astype(jnp.uint32)
            bitbuf = bitbuf | (shift_in >> (32 - sh))  # fake merge
            bitcnt = bitcnt + sh.astype(jnp.int32)
            wordpos = wordpos + jnp.where(need, 1, 0)
            return (bitbuf, bitcnt, wordpos, acc ^ e)

        st = (
            jnp.full((1, 128), 0x9E3779B9, jnp.uint32),
            jnp.full((1, 128), 32, jnp.int32),
            jnp.zeros((1, 128), jnp.int32),
            jnp.zeros((1, 128), jnp.int32),
        )
        bitbuf, bitcnt, wordpos, acc = jax.lax.fori_loop(0, steps, body, st)
        out_ref[...] = acc + bitcnt + wordpos + bitbuf.astype(jnp.int32)

    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    st = jnp.zeros((1, 128), jnp.int32)
    return fn, (table, words, st)


if __name__ == "__main__":
    for name, build in [
        ("P1 lane-gather 4096", build_p1),
        ("P2 sublane-fetch 2048", build_p2),
        ("P3 sublane-fetch 16384", build_p3),
        ("P4 var-shift", build_p4),
        ("P5 combined step", build_p5),
    ]:
        probe(name, build)
