"""Double-float (two-float32) arithmetic — float64 emulation for TPU.

TPU compute units have no native float64, but the reference decoder's
numerics are "compute short f64 expressions of f32 values, store f32"
(`/root/reference/src/dct.c:296-341`, `colour_conversion.c:71-74`; see
core/numerics.py for the exact model). To reproduce those bit-for-bit on
device, values are carried as unevaluated (hi, lo) float32 pairs accurate to
~2^-48 relative — below the 2^-24 rounding granularity of the final float32
store, so the store rounds identically to the C except when the exact value
sits within ~2^-48 of an f32 rounding boundary (probability ~2^-24 per
operation; absent from every corpus image — verified by the bit-exactness
suite in tests/test_device_ops.py).

Algorithms are the classic error-free transformations (Dekker 1971, Knuth
TAOCP v2 §4.2.2): TwoSum, Split, TwoProd — written FMA-free so they are
exact on any IEEE-754 f32 unit (TPU VPU included).

All functions take and return jnp float32 arrays (or (hi, lo) pairs of
them) and are shape-polymorphic.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

F32 = jnp.float32


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly (Knuth TwoSum, 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (Dekker, 3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split of an f32 into 12+12-bit halves: a = hi + lo exactly."""
    t = a * F32(4097.0)  # 2^12 + 1
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker TwoProd, 17 flops)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def const_pair(c: float) -> tuple[np.float32, np.float32]:
    """Split a Python float (f64 literal) into an f32 (hi, lo) pair with
    hi + lo ~= c to ~2^-48 relative."""
    hi = np.float32(c)
    lo = np.float32(np.float64(c) - np.float64(hi))
    return hi, lo


def mul_const(x, c: float):
    """(hi, lo) double-float of f64(c) * x for f32 array x."""
    ch, cl = const_pair(c)
    p, e = two_prod(x, F32(ch))
    e = e + x * F32(cl)
    return fast_two_sum(p, e)


def round_mul_const(x, c: float):
    """round_f32(f64(c) * f64(x)) — one C statement `float r = C * x;`."""
    hi, lo = mul_const(x, c)
    return hi + lo


def add(a_pair, b_pair):
    """Double-float addition of two (hi, lo) pairs."""
    ah, al = a_pair
    bh, bl = b_pair
    s, e = two_sum(ah, bh)
    e = e + (al + bl)
    return fast_two_sum(s, e)


def mul(a_pair, b_pair):
    """Double-float product of two (hi, lo) pairs."""
    ah, al = a_pair
    bh, bl = b_pair
    p, e = two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return fast_two_sum(p, e)


def mul_const_pair_scale(pair, c: float):
    """Double-float product of a (hi, lo) pair and an f64 constant."""
    hi, lo = pair
    ch, cl = const_pair(c)
    p, e = two_prod(hi, F32(ch))
    e = e + (hi * F32(cl) + lo * F32(ch))
    return fast_two_sum(p, e)


def round_pair(pair):
    """Round a (hi, lo) pair to a single f32 — the C's f32 store."""
    hi, lo = pair
    return hi + lo


def round_dot2_const(x, cx: float, y, cy: float):
    """round_f32(f64(cx)*x + f64(cy)*y) — the reference's rotator statements
    (e.g. dct.c:317-318, 327-330)."""
    return round_pair(add(mul_const(x, cx), mul_const(y, cy)))


def round_mul_const_pair(pair, c: float):
    """round_f32(f64(c) * P) where P is a double-float pair — the nested
    products at dct.c:316-319 (outer 0.707106781 * (inner dot))."""
    hi, lo = pair
    ch, cl = const_pair(c)
    p, e = two_prod(hi, F32(ch))
    e = e + hi * F32(cl) + lo * F32(ch)
    return p + e
