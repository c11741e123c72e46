"""Pallas TPU entropy decode: restart-segment lanes in hardware lockstep.

The throughput-grade successor to ops/entropy_device.py's XLA while_loop
backend (which is a correctness testbed at ~1.7 MP/s): one Mosaic kernel
decodes up to 128 restart segments in SIMD lockstep, with every
data-dependent lookup mapped onto the two dynamic-gather forms the TPU
actually supports (measured in benchmarks/pallas_gather_probe*.py):

  * lane crossbar   — [128, 128] take_along_axis(axis=1): each lane (row)
    fetches its next bitstream word from a VMEM window, ~80 ns;
  * sublane shuffle — [8, 128] take_along_axis(axis=0): per-lane row pick
    within one vreg, composing a 1024-entry LUT with one crossbar.

Everything else is branch-free vector math:

  * Huffman code length via the canonical compare ladder (the reference's
    <=16-step walk, /root/reference/src/decode.c:674-681) as a BALANCED
    TREE of 16 compares against SMEM scalar thresholds — legal because the
    lanes are lockstep at the same (MCU, unit) position, so the table is
    uniform across lanes at every step;
  * symbol resolution: canonical index = left-aligned code + per-length
    base, then the composed 1024-entry gather into the symbols table;
  * EXTEND (F.2.2.1) and the run/size bookkeeping as masked vector ops;
  * coefficient store: one-hot accumulate into a [64, 128] block register,
    written to the grid-streamed output at each DU round — the output
    index is STATIC per grid step because the lockstep round IS the DU
    lattice position (scatter-free by construction);
  * bitstream refill: per-lane window rebase DMAs from HBM, issued only
    for lanes below the worst-case-DU guard (unrolled with scalar
    predication; vector->scalar handoff goes through a VMEM scratch ref).

Decodes baseline/extended sequential scans (any sampling) with restart
intervals — the shapes with a lane seam. Progressive scans, restart-free
streams, and oversized segments are REJECTED with JpegUnsupportedError
(no silent fallback: the caller picks a host backend). Truncation and
invalid codes flag the lane; the caller raises, mirroring the other
backends' error contract.

Measured on TPU v5e (4K 4:2:0 q85, bit-exact vs the native C++ decoder
on hardware): 256 segments / 762 DU rounds decode at ~50 ms per
single 128-lane group (~80 MP/s over two sequential invocations); the
INTERLEAVED LANE-GROUP path below lifts that to 133 MP/s (G=2, one
62.5 ms invocation) and 142 MP/s (G=4, 512 segments at ri=63) — 78x
the XLA while_loop backend this replaces (1.7 MP/s). The mechanism:
ablation probes (ladder removed / symbol gathers removed / word fetch
removed, each ~-30-40%) show the per-symbol cost is spread evenly
across three *latency* chains, and an ILP probe of a realistic ~40-op
chain step measured 88 ns alone but 34 ns/chain with 4 independent
chains interleaved — the VLIW schedule fills one chain's stalls with
another's work. So the kernel decodes G (<= 8) independent 128-lane
groups per grid step (G*128 segments per invocation), recovering
~1.7x of that headroom end-to-end (the window build and gathers scale
linearly, diluting the pure-chain 2.6x). At ri=31 (1046 segments) one
G=8 invocation decodes 1024 segments at 137 MP/s vs 92 MP/s for a
G=4 half — past G~2 the per-group-round compute cost is ~flat
(~21 us) and the remaining win is invocation/dispatch amortization. Within one group the
lockstep floor stands: a value-resolved fast path cannot help because
the worst lane's path bounds every step, and a 4x-unrolled AC loop
measured SLOWER (overshoot plus unconditional restage). Throughput
scales inversely with symbols-per-segment — finer restart intervals
decode proportionally faster (the kernel's sweet spot is many short
segments, the shape this engine's own encoder emits).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.driver import run_scans
from ..core.types import COEF_DTYPE, CoefficientPlanes, JpegStructure
from ..core.huffman import build_canonical
from ..io import bitstream as bsio
from ..io.markers import Encoding
from ..native.runtime import scan_layout, _check_segments
from ..utils.config import DecodeConfig
from ..utils.errors import (
    JpegEntropyError,
    JpegTruncatedError,
    JpegUnsupportedError,
)

I32 = jnp.int32
U32 = jnp.uint32
LANES = 128
WIN = 128          # per-round crossbar window, 32-bit words
BIG = 16           # big-window depth in 128-word blocks (2048 words/lane)
MAX_SYMS = 70      # AC-loop hard cap per DU (64 legal symbols + margin)
# Safety ledger: one DU consumes at most ~61 words (DC 31 bits + 63 AC
# symbols at <= 30 bits each), the per-round window starts at wpos & ~63,
# so the round never reads past start + 63 + 61 < start + WIN; the big
# window rebases (1024-word-quantized DMA) whenever wpos - bigbase >= 1024,
# so the two blocks the round window draws from always exist.


# ---------------------------------------------------------------------------
# Host-side table builders
# ---------------------------------------------------------------------------


def _ladder_tables(spec):
    """Canonical decode as (thresholds[16], base[16], symbols[1024]).

    For a left-aligned 16-bit window c: len = 1 + sum_j(c >= thr[j]), and
    the symbol's index into `symbols` is (c >> (16 - len)) + base[len-1].
    thr[j] is the exclusive upper bound of all codes of length <= j+1,
    left-aligned; lengths with no codes inherit the previous bound (their
    comparison then never increments past them). Invalid prefixes resolve
    to index 1023, whose symbol slot is the sentinel 0x1FF.
    """
    # Validation only: build_canonical raises on oversubscribed/invalid
    # DHT counts before the ladder would silently encode garbage.
    build_canonical(spec)
    counts = np.asarray(spec.counts, dtype=np.int64)
    symbols = np.asarray(spec.symbols, dtype=np.int64)
    thr = np.zeros(16, dtype=np.int64)
    base = np.zeros(16, dtype=np.int64)
    sym1024 = np.full(1024, 0x1FF, dtype=np.int32)  # invalid sentinel
    code = 0
    ptr = 0
    bound = 0
    for ln in range(1, 17):
        n = int(counts[ln - 1])
        # codes of this length occupy [code, code + n)
        base[ln - 1] = ptr - code
        if n:
            sym1024[ptr : ptr + n] = symbols[ptr : ptr + n]
        code += n
        bound = code << (16 - ln)
        thr[ln - 1] = bound
        code <<= 1
        ptr += n
    # Positions thr[j] with no codes keep the running bound (monotone).
    for j in range(1, 16):
        if thr[j] < thr[j - 1]:
            thr[j] = thr[j - 1]
    return (
        thr.astype(np.int32),
        base.astype(np.int32),
        sym1024,
    )


@functools.lru_cache(maxsize=256)
def _ladder_cached(counts_b: bytes, symbols_b: bytes):
    from ..core.types import HuffTableSpec

    spec = HuffTableSpec(
        table_class=0, table_id=0,
        counts=np.frombuffer(counts_b, dtype=np.uint8),
        symbols=np.frombuffer(symbols_b, dtype=np.uint8),
    )
    return _ladder_tables(spec)


def _ladder_for_spec(spec):
    return _ladder_cached(
        np.asarray(spec.counts, np.uint8).tobytes(),
        np.asarray(spec.symbols, np.uint8).tobytes(),
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _refill_w8(wpos, win, winbase):
    """Stage the next 8 words per lane into a lanes-as-COLUMNS [8, LANES]
    register block. This is the expensive direction (one [1,128]->[128,1]
    relayout + a [LANES, WIN] crossbar + a [LANES,8]->[8,LANES] transpose)
    but runs only every few symbols; the per-symbol fetch then uses a
    relayout-free sublane gather on the staged block.

    The stage ORIGIN is always wpos (w8base must equal it); only the
    per-word gather index clips to WIN-1. Tail slots past the window end
    may then stage garbage, but the round ledger bounds actual fetches to
    wpos - winbase <= 125 < WIN, so a clipped slot is never consumed."""
    rel = jnp.maximum(wpos - winbase, 0)
    relcol = rel.reshape(LANES, 1)
    cols = jax.lax.broadcasted_iota(I32, (LANES, WIN), 1) & 7
    idx = jnp.clip(relcol + cols, 0, WIN - 1)
    got = jnp.take_along_axis(win, idx, axis=1)[:, :8]   # [LANES, 8]
    return jnp.transpose(got), wpos                       # [8, LANES], base


def _merge_fetch(bbhi, bblo, nbits, wpos, w8, w8base):
    """Fetch one staged word into (bbhi, bblo) for lanes with nbits <= 32.

    w8: [8, LANES] uint32 staged words, lane = column — the fetch is a
    single in-vreg sublane gather with broadcast indices (no relayouts)."""
    need = nbits <= 32
    slot = jnp.clip(wpos - w8base, 0, 7)
    idx = jnp.broadcast_to(slot, (8, LANES))
    got = jnp.take_along_axis(w8, idx, axis=0)[:1]
    w = jnp.where(need, got, U32(0))
    nb = nbits.astype(U32)
    # insert w at bit offset nbits (MSB-aligned 64-bit window in two u32)
    hi_ins = jnp.where(nbits < 32, w >> nb, U32(0))
    lo_sh = (U32(32) - nb) & U32(31)
    lo_ins = jnp.where(
        nbits > 0,
        jnp.where(nbits < 32, w << lo_sh, jnp.where(nbits == 32, w, U32(0))),
        U32(0),
    )
    # nbits == 0: whole word goes to hi
    hi_ins = jnp.where(nbits == 0, w, hi_ins)
    lo_ins = jnp.where(nbits == 0, U32(0), lo_ins)
    bbhi = bbhi | hi_ins
    bblo = bblo | lo_ins
    nbits = jnp.where(need, nbits + 32, nbits)
    wpos = jnp.where(need, wpos + 1, wpos)
    return bbhi, bblo, nbits, wpos


def _consume(bbhi, bblo, nbits, n):
    """Advance the 64-bit window by per-lane n (0..31) bits."""
    nu = n.astype(U32)
    sh = (U32(32) - nu) & U32(31)
    hi = jnp.where(
        n > 0, (bbhi << nu) | jnp.where(n < 32, bblo >> sh, bblo), bbhi
    )
    lo = jnp.where(n > 0, bblo << nu, bblo)
    return hi, lo, nbits - n


def _gather1024(tab, idx):
    """Composed 1024-entry lookup: tab [8, 128] int32, idx [1, LANES] in
    [0, 1024) -> [1, LANES]. crossbar by low 7 bits, sublane pick by top 3."""
    lo = jnp.broadcast_to(idx & 127, (8, LANES))
    rows = jnp.take_along_axis(tab, lo, axis=1)
    hi = jnp.broadcast_to((idx >> 7) & 7, (8, LANES))
    return jnp.take_along_axis(rows, hi, axis=0)[:1]


def _decode_sym(bbhi, thr_scalars, basevec, symtab):
    """One canonical Huffman decode from the 16-bit peek.

    thr_scalars: python list of 16 scalar (traced) thresholds.
    basevec: [8, 128] int32 whose row 0 lanes 1..16 hold base[len].
    symtab: [8, 128] int32 composed 1024-entry symbols table.
    Returns (sym [1,LANES], ln [1,LANES]); invalid prefixes give sym 0x1FF.
    """
    code16 = (bbhi >> 16).astype(I32)
    # balanced tree of the 16 compares
    cs = [(code16 >= t).astype(I32) for t in thr_scalars]
    while len(cs) > 1:
        cs = [a + b for a, b in zip(cs[0::2], cs[1::2])]
    ln = jnp.minimum(1 + cs[0], 16)
    base = _gather1024(basevec, ln)  # base[len] via lanes 1..16
    idx = (code16 >> (16 - ln).astype(U32)) + base
    bad = (idx < 0) | (idx > 1023)
    idx = jnp.clip(idx, 0, 1023)
    sym = _gather1024(symtab, idx)
    sym = jnp.where(bad, 0x1FF, sym)
    return sym, ln


def _extend(v, size):
    """Spec F.2.2.1 EXTEND, vectorized (size 0 -> 0)."""
    half = jnp.where(size > 0, 1 << jnp.maximum(size - 1, 0), 0)
    return jnp.where(
        size > 0, jnp.where(v < half, v - 2 * half + 1, v), 0
    )


#: Per-group scratch refs, in order (the kernel signature repeats this
#: block G times, then one shared DMA-semaphore array).
_N_SCRATCH_PER_GROUP = 9


def _build_pallas_decode(R, P, n_luts, W_words, sched_tuple, G):
    """Compile-time-static kernel builder.

    R: grid size (max mcus per lane * P). sched_tuple: per-unit
    (dc_lut, ac_lut, scomp) static python tuples of length P.
    G: number of interleaved 128-lane groups. The per-symbol chain is
    latency-bound (measured: a realistic ~40-op chain step costs 88 ns
    alone but 34 ns/chain when 4 independent chains share the VLIW
    schedule), so G groups decode G*128 segments in well under G times
    one group's wall clock — the groups' independent dependency chains
    fill each other's pipeline stalls.
    """
    dc_of_u, ac_of_u, sci_of_u = sched_tuple

    Wr = W_words // 128  # stream depth in 128-word blocks, multiple of 8

    def kernel(*refs):
        # signature: thr, sched, base, sym, mcu_count*G, streams*G,
        #            out*G, state*G, scratch-block*G, sem
        thr_ref, sched_ref, base_ref, sym_ref = refs[:4]
        mcu_refs = refs[4 : 4 + G]
        stream_refs = refs[4 + G : 4 + 2 * G]
        out_refs = refs[4 + 2 * G : 4 + 3 * G]
        state_refs = refs[4 + 3 * G : 4 + 4 * G]
        scr = refs[4 + 4 * G : 4 + 4 * G + G * _N_SCRATCH_PER_GROUP]
        sem_ref = refs[-1]

        def S(g):
            """Scratch refs of group g: (winbig, bbhi, bblo, nbits, wpos,
            bigbase, preds, bad, acc)."""
            k = g * _N_SCRATCH_PER_GROUP
            return scr[k : k + _N_SCRATCH_PER_GROUP]

        r = pl.program_id(0)

        @pl.when(r == 0)
        def _init():
            for g in range(G):
                (_wb, bbhi_ref, bblo_ref, nbits_ref, wpos_ref,
                 bigbase_ref, preds_ref, bad_ref, acc_ref) = S(g)
                bbhi_ref[...] = jnp.zeros((1, LANES), U32)
                bblo_ref[...] = jnp.zeros((1, LANES), U32)
                nbits_ref[...] = jnp.zeros((1, LANES), I32)
                wpos_ref[...] = jnp.zeros((1, LANES), I32)
                bigbase_ref[...] = jnp.full((1, LANES), -(BIG * 128), I32)
                preds_ref[...] = jnp.zeros((8, LANES), I32)
                bad_ref[...] = jnp.zeros((1, LANES), I32)
                acc_ref[...] = jnp.zeros((64, LANES), I32)

        # --- big-window rebase: per-lane 2048-word DMA, 1024-quantized ---
        for g in range(G):
            (winbig_ref, _bh, _bl, _nb, wpos_ref, bigbase_ref,
             _pr, _bd, _ac) = S(g)
            streams_ref = stream_refs[g]
            state_ref = state_refs[g]
            wpos_v = wpos_ref[...]
            bigbase_v = bigbase_ref[...]
            lane_needs = (wpos_v - bigbase_v) >= 1024
            any_needs = jnp.any(lane_needs)
            newbase = jnp.clip(wpos_v & ~1023, 0, (Wr - BIG) * 128)
            bigbase_ref[...] = jnp.where(lane_needs, newbase, bigbase_v)
            # scalar handoff: predicates/block rows via VMEM scratch reads
            state_ref[2, :] = jnp.where(lane_needs, 1, 0)[0]
            state_ref[3, :] = (newbase >> 7)[0]

            @pl.when(any_needs)
            def _rebase(state_ref=state_ref, streams_ref=streams_ref,
                        winbig_ref=winbig_ref, g=g):
                # [16, 128]-block slices of the 3-D stream keep both tiled
                # dims aligned (single-row 2-D slices are rejected by
                # Mosaic).
                for lane in range(LANES):
                    flag = state_ref[2, lane]

                    @pl.when(flag == 1)
                    def _issue(lane=lane):
                        blk = pl.multiple_of(state_ref[3, lane], 8)
                        pltpu.make_async_copy(
                            streams_ref.at[lane, pl.ds(blk, BIG), :],
                            winbig_ref.at[lane],
                            sem_ref.at[g * 16 + lane % 16],
                        ).start()

                for lane in range(LANES):
                    flag = state_ref[2, lane]

                    @pl.when(flag == 1)
                    def _wait(lane=lane):
                        blk = pl.multiple_of(state_ref[3, lane], 8)
                        pltpu.make_async_copy(
                            streams_ref.at[lane, pl.ds(blk, BIG), :],
                            winbig_ref.at[lane],
                            sem_ref.at[g * 16 + lane % 16],
                        ).wait()

        # --- per-round schedule (r % P selects the unit; SMEM scalars) ---
        # Shared by all groups: they are lockstep at the same DU-lattice
        # position, so table ids and scan component are uniform.
        u = r % P
        dc_lut = sched_ref[0, u]
        ac_lut = sched_ref[1, u]
        sci = sched_ref[2, u]
        m = r // P

        # SMEM threshold scalars for the selected tables. thr_ref is
        # [n_luts, 16]; lut ids are traced scalars -> dynamic SMEM reads.
        dc_thr = [thr_ref[dc_lut, j] for j in range(16)]
        ac_thr = [thr_ref[ac_lut, j] for j in range(16)]
        dc_base = base_ref[pl.ds(dc_lut, 1)][0]
        ac_base = base_ref[pl.ds(ac_lut, 1)][0]
        dc_sym = sym_ref[pl.ds(dc_lut, 1)][0]
        ac_sym = sym_ref[pl.ds(ac_lut, 1)][0]

        # --- per-group round state: window, DC symbol ---------------------
        actives, wins, winbases = [], [], []
        st_groups = []
        for g in range(G):
            (winbig_ref, bbhi_ref, bblo_ref, nbits_ref, wpos_ref,
             bigbase_ref, preds_ref, bad_ref, acc_ref) = S(g)
            active = (m < mcu_refs[g][0, :]).reshape(1, LANES)
            actives.append(active)

            # per-round 128-word crossbar window: start at wpos & ~63 (the
            # round consumes <= 61 more words, so [start, start+128)
            # covers it); built from the (at most two) big-window blocks
            # it spans via static selects — no gathers.
            wpos_v = wpos_ref[...]
            bigbase_v = bigbase_ref[...]
            start = wpos_v & ~63
            relblk = (start - bigbase_v) >> 7      # [1,LANES] in [0, 8]
            blkcol = relblk.reshape(LANES, 1)
            halfsel = (start & 64).reshape(LANES, 1) > 0
            A = jnp.zeros((LANES, WIN), U32)
            B = jnp.zeros((LANES, WIN), U32)
            for k in range(10):
                blk_k = winbig_ref[:, k, :]
                A = jnp.where(blkcol == k, blk_k, A)
                B = jnp.where(blkcol == (k - 1), blk_k, B)
            mixed = jnp.concatenate([A[:, 64:], B[:, :64]], axis=1)
            win = jnp.where(halfsel, mixed, A)
            winbase_v = start
            wins.append(win)
            winbases.append(winbase_v)

            bbhi = bbhi_ref[...]
            bblo = bblo_ref[...]
            nbits = nbits_ref[...]
            wpos = wpos_ref[...]
            bad = bad_ref[...]

            # stage the first 8 words; the round's fetches then run on
            # cheap sublane gathers, re-staging every 4th AC symbol
            # (ledger: DC does <= 3 fetches, each AC iteration <= 1, so
            # the slot never hits 8)
            w8, w8base = _refill_w8(wpos, win, winbase_v)

            # establish the >= 33-bit invariant (two fetches cover 0 bits)
            bbhi, bblo, nbits, wpos = _merge_fetch(
                bbhi, bblo, nbits, wpos, w8, w8base)
            bbhi, bblo, nbits, wpos = _merge_fetch(
                bbhi, bblo, nbits, wpos, w8, w8base)

            # --- DC symbol ------------------------------------------------
            sym, ln = _decode_sym(bbhi, dc_thr, dc_base, dc_sym)
            bad = bad | jnp.where(active & (sym > 15), 1, 0)
            size = jnp.clip(jnp.where(sym > 15, 0, sym), 0, 15)
            bbhi, bblo, nbits = _consume(
                bbhi, bblo, nbits, jnp.where(active, ln, 0))
            v = jnp.where(
                size > 0,
                (bbhi >> (U32(32) - size.astype(U32))).astype(I32), 0
            )
            bbhi, bblo, nbits = _consume(
                bbhi, bblo, nbits, jnp.where(active, size, 0))
            bbhi, bblo, nbits, wpos = _merge_fetch(
                bbhi, bblo, nbits, wpos, w8, w8base)
            diff = _extend(v, size)
            pred_row = jnp.take_along_axis(
                preds_ref[...], jnp.broadcast_to(sci.reshape(1, 1),
                                                 (8, LANES)), axis=0
            )[:1]
            pred_new = pred_row + jnp.where(active, diff, 0)
            # store back the selected predictor row
            rowsel = (jax.lax.broadcasted_iota(I32, (8, LANES), 0) == sci)
            preds_ref[...] = jnp.where(
                rowsel, jnp.broadcast_to(pred_new, (8, LANES)),
                preds_ref[...]
            )
            acc_ref[0, :] = jnp.where(active, pred_new, 0)[0]

            st_groups.append((bbhi, bblo, nbits, wpos,
                              jnp.ones((1, LANES), I32),   # ci starts at 1
                              jnp.where(active, 1, 0), bad, w8, w8base))

        # --- AC loop: all groups advance one symbol per trip --------------
        # A trip's work for group g only depends on group g's state, so the
        # G per-trip chains are independent and fill each other's latency.
        def ac_step(g, gst, it):
            bbhi, bblo, nbits, wpos, ci, running, bad, w8, w8base = gst
            (_wb, _bh, _bl, _nb, _wp, _bb, _pr, _bd, acc_ref) = S(g)
            active = actives[g]
            sym, ln = _decode_sym(bbhi, ac_thr, ac_base, ac_sym)
            act = (running > 0) & active
            bad = bad | jnp.where(act & (sym == 0x1FF), 1, 0)
            sym = jnp.where(sym == 0x1FF, 0, sym)  # treat as EOB once bad
            size = sym & 15
            run = sym >> 4
            is_eob = sym == 0
            is_zrl = sym == 0xF0
            bbhi, bblo, nbits = _consume(
                bbhi, bblo, nbits, jnp.where(act, ln, 0))
            ci_t = ci + run
            # any non-EOB/ZRL symbol whose run pushes past 63 is malformed
            # (the oracle raises, the native decoder returns COEF_RANGE),
            # including zero-size symbols that write nothing
            oob = act & (~is_eob) & (~is_zrl) & (ci_t > 63)
            bad = bad | jnp.where(oob, 1, 0)
            write = act & (~is_eob) & (~is_zrl) & (size > 0) & (ci_t <= 63)
            v = jnp.where(
                size > 0,
                (bbhi >> (U32(32) - size.astype(U32))).astype(I32), 0,
            )
            bbhi, bblo, nbits = _consume(
                bbhi, bblo, nbits, jnp.where(act, size, 0))
            bbhi, bblo, nbits, wpos = _merge_fetch(
                bbhi, bblo, nbits, wpos, w8, w8base)
            w8, w8base = lax.cond(
                (it & 3) == 3,
                lambda: _refill_w8(wpos, wins[g], winbases[g]),
                lambda: (w8, w8base),
            )
            val = _extend(v, size)
            onehot = (
                jax.lax.broadcasted_iota(I32, (64, LANES), 0)
                == jnp.broadcast_to(ci_t, (64, LANES))
            )
            acc_ref[...] = acc_ref[...] + jnp.where(
                onehot & jnp.broadcast_to(write, (64, LANES)),
                jnp.broadcast_to(val, (64, LANES)), 0,
            )
            ci = jnp.where(
                act,
                jnp.where(is_zrl, ci + 16, ci_t + 1),
                ci,
            )
            running = jnp.where(
                (running > 0) & (~is_eob) & (ci <= 63) & (~(bad > 0)), 1, 0
            )
            return (bbhi, bblo, nbits, wpos, ci, running, bad, w8, w8base)

        def ac_body(st):
            it = st[0]
            groups = st[1:]
            new = tuple(ac_step(g, groups[g], it) for g in range(G))
            return (it + 1,) + new

        def ac_cond(st):
            it = st[0]
            any_running = jnp.zeros((1, LANES), jnp.bool_)
            for g in range(G):
                any_running = any_running | (
                    (st[1 + g][5] > 0) & actives[g]
                )
            return jnp.any(any_running) & (it < MAX_SYMS)

        st = (jnp.zeros((), I32),) + tuple(st_groups)
        st = lax.while_loop(ac_cond, ac_body, st)

        # --- flush the blocks and persist state ---------------------------
        for g in range(G):
            (bbhi, bblo, nbits, wpos, _ci, _run, bad,
             _w8, _w8b) = st[1 + g]
            (_wb, bbhi_ref, bblo_ref, nbits_ref, wpos_ref,
             _bb, _pr, bad_ref, acc_ref) = S(g)
            out_refs[g][0, :, :] = acc_ref[...].astype(jnp.int16)
            acc_ref[...] = jnp.zeros((64, LANES), I32)
            bbhi_ref[...] = bbhi
            bblo_ref[...] = bblo
            nbits_ref[...] = nbits
            wpos_ref[...] = wpos
            bad_ref[...] = bad
            # truncation bookkeeping: final consumed-bit position per lane
            state_refs[g][0, :] = (wpos * 32 - nbits)[0]
            state_refs[g][1, :] = bad[0]

    return kernel


@functools.lru_cache(maxsize=32)
def _build_decode_fn(R, P, n_luts, W_words, sched_tuple, G, interpret):
    kernel = _build_pallas_decode(R, P, n_luts, W_words, sched_tuple, G)
    per_group_scratch = [
        pltpu.VMEM((LANES, BIG, 128), U32),  # winbig (2048 words/lane)
        pltpu.VMEM((1, LANES), U32),     # bbhi
        pltpu.VMEM((1, LANES), U32),     # bblo
        pltpu.VMEM((1, LANES), I32),     # nbits
        pltpu.VMEM((1, LANES), I32),     # wpos
        pltpu.VMEM((1, LANES), I32),     # bigbase
        pltpu.VMEM((8, LANES), I32),     # preds
        pltpu.VMEM((1, LANES), I32),     # bad
        pltpu.VMEM((64, LANES), I32),    # acc
    ]
    assert len(per_group_scratch) == _N_SCRATCH_PER_GROUP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # thr [n_luts, 16]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # sched [3, P]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # base [n_luts, 8, 128]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # sym [n_luts, 8, 128]
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)      # mcu_count [1, LANES]
           for _ in range(G)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)       # streams [LANES, W]
           for _ in range(G)],
        out_specs=[
            pl.BlockSpec((1, 64, LANES), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM)     # coeffs per round
            for _ in range(G)
        ]
        + [
            pl.BlockSpec((8, LANES), lambda r: (0, 0),
                         memory_space=pltpu.VMEM)     # final state
            for _ in range(G)
        ],
        scratch_shapes=per_group_scratch * G
        + [pltpu.SemaphoreType.DMA((G * 16,))],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, 64, LANES), jnp.int16)
            for _ in range(G)
        ]
        + [jax.ShapeDtypeStruct((8, LANES), I32) for _ in range(G)],
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


def _pack_group(lane_segments, n_lanes):
    """Unstuff a chunk of <= n_lanes (data, start, end) lane segments into
    [n_lanes, W_words] uint32 big-endian words (zero tail >= one big
    window; total a multiple of 1024 so the rebase DMA's block rows stay
    8-aligned) and per-lane word counts. All lanes share one W_words so a
    G-group invocation has one compile key. Lanes are image-agnostic:
    (data, s, e) triples may come from DIFFERENT streams (the batched
    serving path packs many images' segments into one invocation)."""
    segs = []
    for data, s, e in lane_segments:
        unstuffed, _ = bsio.unstuff(data, s, e)
        segs.append(unstuffed)
    maxlen = max(x.shape[0] for x in segs)
    # Quantize the stream depth coarsely (4096-word buckets) so the kernel
    # compile key stays stable across same-shaped images whose segment
    # lengths differ by content.
    W_words = -(-(-(-maxlen // 4) + BIG * 128) // 4096) * 4096
    arr = np.zeros((n_lanes, W_words * 4), dtype=np.uint8)
    nbytes = np.zeros(n_lanes, dtype=np.int64)
    for i, x in enumerate(segs):
        arr[i, : x.shape[0]] = x
        nbytes[i] = x.shape[0]
    words = (
        arr.reshape(n_lanes, W_words, 4).astype(np.uint32)
    )
    words = (
        (words[:, :, 0] << 24) | (words[:, :, 1] << 16)
        | (words[:, :, 2] << 8) | words[:, :, 3]
    )
    return words, nbytes, W_words


#: Reject scans whose per-group output would exceed this (bytes) — the
#: lockstep kernel only pays off with MANY SHORT segments; a restart-free
#: stream would otherwise allocate R*64*128 int16 of output for one live
#: lane (and a >=256 MB segment would overflow the int32 bit counter).
_MAX_GROUP_OUT_BYTES = 512 << 20



class _LaneJob:
    """One kernel lane: a restart segment of some stream, plus where its
    decoded DUs scatter. Image-agnostic — the batched serving path mixes
    lanes from many images in one invocation."""

    __slots__ = ("data", "lo", "hi", "mcu_count", "s_abs", "planes",
                 "params")

    def __init__(self, data, lo, hi, mcu_count, s_abs, planes, params):
        self.data = data
        self.lo = lo
        self.hi = hi
        self.mcu_count = mcu_count
        self.s_abs = s_abs          # segment index within its own image
        self.planes = planes
        self.params = params        # [P, 11] unit layout of its image


def _scan_tables(scan, params):
    """Ladder tables per distinct (class, id) spec used by a scan, plus
    the static unit schedule."""
    P = params.shape[0]
    specs = []
    spec_index = {}
    sched_dc, sched_ac, sched_sci = [], [], []
    for u in range(P):
        sc = scan.header.components[int(params[u, 1])]
        for cls, tid, tables in (
            (0, sc.dc, scan.dc_tables), (1, sc.ac, scan.ac_tables),
        ):
            key = (cls, tid)
            if key not in spec_index:
                spec_index[key] = len(specs)
                specs.append(tables[tid])
        sched_dc.append(spec_index[(0, sc.dc)])
        sched_ac.append(spec_index[(1, sc.ac)])
        sched_sci.append(int(params[u, 1]))

    thr = np.zeros((len(specs), 16), dtype=np.int32)
    basetabs = np.zeros((len(specs), 8, 128), dtype=np.int32)
    symtabs = np.zeros((len(specs), 8, 128), dtype=np.int32)
    for i, spec in enumerate(specs):
        t, b, s1024 = _ladder_for_spec(spec)
        thr[i] = t
        # base[len] lives at composed-LUT index len (1..16)
        basetabs[i].reshape(-1)[1:17] = b
        symtabs[i] = s1024.reshape(8, 128)
    sched = (tuple(sched_dc), tuple(sched_ac), tuple(sched_sci))
    return specs, sched, thr, basetabs, symtabs


def _run_lane_jobs(jobs, n_specs, sched, thr, basetabs, symtabs,
                   ri, P, interpret):
    """Pack lane jobs into G-group invocations, decode, verify, scatter.

    All jobs share (ri, P, sched, table content) — the compile-static
    parts of the kernel; their streams, segment indices, and target
    planes are per-lane.

    Interleaved lane-groups: G * LANES segments per invocation. The
    per-symbol chain is latency-bound, so G groups cost far less than G
    sequential invocations (measured 34 vs 88 ns/chain-step at G=4) —
    and G-fold fewer dispatches matters on its own through the axon
    tunnel (~30 ms each).
    """
    sched_dc, sched_ac, sched_sci = sched
    n_jobs = len(jobs)
    G = min(8, max(1, -(-n_jobs // LANES)))
    per_inv = G * LANES

    for g0 in range(0, n_jobs, per_inv):
        chunk = jobs[g0 : g0 + per_inv]
        words, nbytes, W_words = _pack_group(
            [(j.data, j.lo, j.hi) for j in chunk], per_inv
        )
        mcu_count = np.zeros(per_inv, dtype=np.int32)
        for i, j in enumerate(chunk):
            mcu_count[i] = j.mcu_count
        # Shape-stable compile key: pad R to the full restart interval
        # (excess rounds are active-masked) so content-dependent group
        # maxima don't trigger fresh multi-minute Mosaic compiles.
        R = ri * P
        fn = _build_decode_fn(
            R, P, n_specs, W_words, sched, G, interpret,
        )
        sched_arr = np.asarray(
            [sched_dc, sched_ac, sched_sci], dtype=np.int32
        )
        words3 = words.reshape(G, LANES, W_words // 128, 128)
        outs = fn(
            jnp.asarray(thr),
            jnp.asarray(sched_arr),
            jnp.asarray(basetabs),
            jnp.asarray(symtabs),
            *[jnp.asarray(mcu_count[g * LANES : (g + 1) * LANES])
              .reshape(1, LANES) for g in range(G)],
            *[jnp.asarray(words3[g]) for g in range(G)],
        )
        coeffs_g = outs[:G]
        states = np.stack(
            [np.asarray(jax.device_get(s)) for s in outs[G : 2 * G]]
        )  # [G, 8, LANES]
        n_in_chunk = len(chunk)
        bad = states[:, 1, :].reshape(per_inv)
        if bad[:n_in_chunk].any():
            raise JpegEntropyError(
                "pallas entropy decode hit an invalid Huffman code"
            )
        # truncation: same 7-alignment-bit rule as every other backend
        bitpos = states[:, 0, :].reshape(per_inv).astype(np.int64)
        real_bits = 8 * nbytes
        # the kernel's wpos over-fetches up to 64 look-ahead bits; consumed
        # position = wpos*32 - nbits already accounts for that.
        if (bitpos[:n_in_chunk] > real_bits[:n_in_chunk] + 7).any():
            raise JpegTruncatedError(
                "entropy data truncated (pallas decode consumed fabricated"
                " bits)"
            )

        # host scatter into planes (index math mirrors UnitLayout),
        # vectorized per (group, same-image lane run, unit): one
        # fancy-index store each instead of a python loop per lane.
        mlocal = np.arange(ri, dtype=np.int64)           # [ri]
        for g in range(G):
            lo = g * LANES
            if lo >= n_in_chunk:
                break
            nl = min(LANES, n_in_chunk - lo)
            coeffs = np.asarray(jax.device_get(coeffs_g[g]))
            # contiguous runs of lanes targeting the same image
            a = 0
            while a < nl:
                b = a + 1
                tgt = chunk[lo + a].planes
                while b < nl and chunk[lo + b].planes is tgt:
                    b += 1
                run = chunk[lo + a : lo + b]
                params = run[0].params
                s_abs = np.array([j.s_abs for j in run], dtype=np.int64)
                live = (
                    mlocal[None, :] < mcu_count[lo + a : lo + b, None]
                )  # [run, ri]
                mglobal = s_abs[:, None] * ri + mlocal[None, :]
                for u in range(P):
                    pl_i, sci_u, _dc, _ac, h, v, j, k, wrap, bw, bh = [
                        int(x) for x in params[u]
                    ]
                    base = mglobal * h + k
                    bx = base % wrap
                    by = (base // wrap) * v + j
                    ok = live & (by < bh) & (bx < bw)
                    # coeffs[m*P+u, :, lane] per (lane, m) -> [run, ri, 64]
                    vals = np.transpose(
                        coeffs[mlocal * P + u, :, a:b], (2, 0, 1)
                    )
                    plane = tgt.plane(pl_i)
                    plane[by[ok], bx[ok], :] = vals[ok]
                a = b


def decode_scan_pallas(structure, scan, planes: CoefficientPlanes, cfg,
                       interpret: bool = False):
    frame = structure.frame
    total_mcus, params, _luts_flat = scan_layout(structure, scan)
    n_segs = _check_segments(scan, total_mcus)
    ri = scan.restart_interval or total_mcus
    P = params.shape[0]
    # worst case: 8 interleaved lane-groups per invocation (G below)
    group_out_bytes = ri * P * 64 * LANES * 2 * 8
    if scan.restart_interval == 0 and total_mcus > 256:
        raise JpegUnsupportedError(
            "pallas entropy backend needs restart intervals (lockstep lanes"
            " = restart segments); use the native backend for restart-free"
            " streams"
        )
    if group_out_bytes > _MAX_GROUP_OUT_BYTES:
        raise JpegUnsupportedError(
            f"restart segments too long for the pallas backend"
            f" ({ri} MCUs/segment); use the native backend"
        )

    specs, sched, thr, basetabs, symtabs = _scan_tables(scan, params)

    bounds = list(scan.span.segment_bounds())
    jobs = [
        _LaneJob(
            data=structure.data,
            lo=int(b[0]), hi=int(b[1]),
            mcu_count=int(min(ri, total_mcus - i * ri)),
            s_abs=i, planes=planes, params=params,
        )
        for i, b in enumerate(bounds)
    ]
    _run_lane_jobs(jobs, len(specs), sched, thr, basetabs, symtabs,
                   ri, P, interpret)


def batchable(structure) -> bool:
    """True when entropy_decode_batch can decode this structure: a
    single-scan sequential stream whose restart segments fit the lockstep
    kernel. Mirrors entropy_decode_batch's guards without raising, so the
    serving path (parallel.batch.BatchDecoder) can partition a mixed batch
    into device-resident members and honest per-image fallbacks."""
    frame = structure.frame
    if frame.process == Encoding.PROGRESSIVE_DCT or len(structure.scans) != 1:
        return False
    scan = structure.scans[0]
    try:
        total_mcus, params, _ = scan_layout(structure, scan)
        _check_segments(scan, total_mcus)
    except Exception:
        return False
    ri = scan.restart_interval or total_mcus
    P = params.shape[0]
    if scan.restart_interval == 0 and total_mcus > 256:
        return False
    if ri * P * 64 * LANES * 2 * 8 > _MAX_GROUP_OUT_BYTES:
        return False
    return True


def entropy_decode_batch(
    structures,
    cfg: DecodeConfig,
    interpret: bool = False,
):
    """Batched serving path (VERDICT r2 item 2a): segments from MANY
    images fill one G=8 invocation's 1024 lanes. Lanes are image-agnostic,
    so a 135-segment 4K image no longer runs a half-occupied G=2 kernel —
    eight such images pack 1080 lanes at full occupancy, amortizing
    dispatch (~30 ms/invocation through the axon tunnel) and the
    per-invocation window setup.

    Constraint: lanes sharing an invocation must share the kernel's
    compile- and SMEM-uniform state — (ri, P, unit schedule, DHT table
    content). That is the steady-state serving case (one encoder config,
    many images). Images are grouped by that key; each group decodes in
    ceil(segments/1024) invocations. Returns [(planes, qts)] aligned with
    `structures`.
    """
    if not interpret and jax.devices()[0].platform != "tpu":
        interpret = True
    results = [None] * len(structures)
    groups: dict = {}
    for i, structure in enumerate(structures):
        frame = structure.frame
        if frame.process == Encoding.PROGRESSIVE_DCT or len(
            structure.scans
        ) != 1:
            raise JpegUnsupportedError(
                "pallas batched decode handles single-scan sequential"
                " streams"
            )
        scan = structure.scans[0]
        total_mcus, params, _ = scan_layout(structure, scan)
        _check_segments(scan, total_mcus)
        ri = scan.restart_interval or total_mcus
        P = params.shape[0]
        if scan.restart_interval == 0 and total_mcus > 256:
            raise JpegUnsupportedError(
                "pallas entropy backend needs restart intervals"
            )
        if ri * P * 64 * LANES * 2 * 8 > _MAX_GROUP_OUT_BYTES:
            raise JpegUnsupportedError(
                f"restart segments too long for the pallas backend"
                f" ({ri} MCUs/segment); use the native backend"
            )
        specs, sched, thr, basetabs, symtabs = _scan_tables(scan, params)
        tab_key = tuple(
            (np.asarray(sp.counts, np.uint8).tobytes(),
             np.asarray(sp.symbols, np.uint8).tobytes())
            for sp in specs
        )
        key = (ri, P, sched, tab_key)
        planes = CoefficientPlanes(frame)
        qts = {tid: qt.values for tid, qt in scan.quant_tables.items()}
        results[i] = (planes, qts)
        bounds = list(scan.span.segment_bounds())
        jobs = [
            _LaneJob(
                data=structure.data,
                lo=int(b[0]), hi=int(b[1]),
                mcu_count=int(min(ri, total_mcus - si * ri)),
                s_abs=si, planes=planes, params=params,
            )
            for si, b in enumerate(bounds)
        ]
        entry = groups.setdefault(
            key, ([], len(specs), sched, thr, basetabs, symtabs)
        )
        entry[0].extend(jobs)
    for (ri, P, sched, _tk), (jobs, n_specs, sched2, thr, basetabs,
                              symtabs) in groups.items():
        _run_lane_jobs(jobs, n_specs, sched2, thr, basetabs, symtabs,
                       ri, P, interpret)
    return results


def entropy_decode(
    structure: JpegStructure,
    cfg: DecodeConfig,
    planes: CoefficientPlanes | None = None,
    interpret: bool = False,
):
    """All scans -> (CoefficientPlanes, qtid -> table), decoded by the
    Pallas lockstep kernel. Sequential scans only."""
    frame = structure.frame
    if frame.process == Encoding.PROGRESSIVE_DCT:
        raise JpegUnsupportedError(
            "pallas entropy backend does not decode progressive scans"
        )
    # Off-TPU (CPU test meshes) the Mosaic kernel cannot compile; the
    # interpreter preserves exact semantics for the conformance suite.
    if not interpret and jax.devices()[0].platform != "tpu":
        interpret = True
    if planes is None:
        planes = CoefficientPlanes(frame)
    qts = run_scans(
        structure, planes,
        lambda s, scan, p: decode_scan_pallas(s, scan, p, cfg, interpret),
    )
    return planes, qts
