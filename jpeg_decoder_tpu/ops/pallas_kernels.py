"""Pallas TPU kernels for the decode hot path.

`idct_pallas` is the hand-scheduled form of ops/idct.idct_matmul: fused
dequant + dezigzag + 8x8 IDCT + level shift + clamp + uint8 pack for a whole
batch of blocks, expressed to map straight onto the TPU:

  * blocks are processed TWO per row — [N/2, 128] tiles — so both the int32
    input and the uint8 output fill full 128-lane registers, and the IDCT
    matrix becomes a 128x128 block-diagonal operand: one MXU-shaped
    [TILE, 128] @ [128, 128] matmul per grid step;
  * the dequant multiply, the matmul, the floor/clip epilogue and the uint8
    cast all happen in VMEM within a single grid step — one HBM read of the
    coefficients, one HBM write of the pixels, nothing else;
  * grid is 1-D over row tiles; the kernel is memory-bound, so TILE is
    sized for pipelining (double-buffered by the Pallas runtime), not
    for MXU occupancy.

Numerics match ops/idct.idct_matmul (the FLOAT32 contract: within +/-1 LSB
of the bit-exact EXACT path; on hardware the two differ by <=1 LSB from
accumulation order). The EXACT double-float path stays on the XLA
elementwise pipeline (ops/idct.idct_exact) — it has no matmul to win back
and XLA already fuses it fully.

On non-TPU backends the kernel runs in interpreter mode (tests exercise it
on the CPU mesh; the driver benches it on hardware).

Measured on TPU v5e (batch-slope method, this op is ~1% of pipeline time
either way — host entropy decode is the bottleneck):
    XLA matmul path : 0.67 ms / 1M blocks  (~95 GP/s)
    this kernel     : 4.9  ms / 1M blocks  (~13 GP/s)
    EXACT (df32)    : 28.7 ms / 1M blocks  (~2.2 GP/s)
XLA's own fusion of dequant+matmul+epilogue beats this hand-written
schedule (its 6-pass f32 matmul pipelines better), so the XLA path stays
the default; the kernel is kept as the scheduling baseline.

WHY XLA WINS HERE (the retirement analysis): this op is a dense
[N, 64] @ [64, 64] matmul with elementwise pre/post stages — exactly the
shape XLA's TPU emitter is built around. Its fusion already achieves one
HBM read + one HBM write, its latency-hiding pipeline across grid steps
is generated from a cost model this kernel can only approximate, and the
Precision.HIGHEST decomposition overlaps its bf16 passes in ways a single
hand-written `jnp.dot` does not. A bf16-input variant cannot beat it on
numerics either: coefficients (<= 15 bits) would need a hi/lo split into
TWO bf16 matmuls plus an f32 combine — the same work HIGHEST already
schedules. Hand scheduling pays on TPU where the COMPILER cannot express
the computation — data-dependent control flow, per-lane gathers, serial
state — which is why the Pallas investment moved to the entropy stage
(ops/entropy_pallas.py: 44x over the XLA formulation of the same loop),
not this one.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import ZIGZAG
from .idct import idct_matrix_zz

F32 = jnp.float32
TILE = 512  # row-pairs per grid step: in 512*128*4B=256KB, out 64KB in VMEM


@functools.lru_cache(maxsize=None)
def _blockdiag_matrix() -> np.ndarray:
    """[128, 128] block-diag(K, K): two blocks' IDCTs in one matmul."""
    k = idct_matrix_zz()
    m = np.zeros((128, 128), dtype=np.float32)
    m[:64, :64] = k
    m[64:, 64:] = k
    return m


def _kernel(x_ref, qt_ref, m_ref, out_ref):
    x = x_ref[:].astype(F32) * qt_ref[:]
    # HIGHEST precision: without it the MXU runs bf16 passes and the
    # dequantized coefficients (up to ~2^19) lose low bits (seen as errors
    # up to 229 LSB on hardware).
    y = jax.lax.dot_general(
        x, m_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=F32,
    )
    q = jnp.clip(jnp.floor(y) + F32(128.0), 0.0, 255.0)
    # Mosaic has no direct f32->u8 cast; go through i32 (value is in range).
    out_ref[:] = q.astype(jnp.int32).astype(jnp.uint8)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def _idct_pallas_padded(coeffs2, qt128, m128, interpret=False):
    n2 = coeffs2.shape[0]
    grid = n2 // TILE
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n2, 128), jnp.uint8),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n2 * 128 * 128,
            bytes_accessed=n2 * 128 * 4 + n2 * 128 + 128 * 128 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coeffs2, qt128, m128)


def idct_pallas(coeffs_zz, qtable_natural, interpret: bool | None = None):
    """[N, 64] zigzag int32 coefficients -> [N, 64] uint8 raster pixels.

    Fused Pallas path (8-bit output only; FLOAT32 numeric contract)."""
    if interpret is None:
        interpret = _interpret()
    n = coeffs_zz.shape[0]
    qt_zz = np.asarray(qtable_natural, dtype=np.float32)[ZIGZAG]
    qt128 = jnp.asarray(np.concatenate([qt_zz, qt_zz])[None, :])
    m128 = jnp.asarray(_blockdiag_matrix())

    # Pad to an even number of blocks, then to a TILE multiple of row-pairs.
    n2 = -(-n // 2)
    pad_rows = (-n2 % TILE) * 2 + (n2 * 2 - n)
    x = jnp.pad(coeffs_zz, ((0, pad_rows), (0, 0))).reshape(-1, 128)
    out = _idct_pallas_padded(x, qt128, m128, interpret=interpret)
    return out.reshape(-1, 64)[:n]
