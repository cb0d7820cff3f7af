"""Unsigned 64-bit integer arithmetic emulated on uint32 lane pairs.

TPUs have no native 64-bit integer lanes; everything 64-bit in this framework
(xxhash64 state, double-hash values, activation thresholds) is carried as a
pair of uint32 arrays ``(hi, lo)``.  All helpers are shape-polymorphic,
jit-friendly, and wrap modulo 2**64 exactly like C/uint64 semantics, which is
what the reference's Python-bigint-with-masking hash math reduces to.

The reference computes these quantities with CPython big ints via the xxhash
C extension (reference: improved_video_compressor.py:65-97,
rational_bloom_filter.py:103-137); here they are data-parallel VPU programs.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

U64 = Tuple[jnp.ndarray, jnp.ndarray]  # (hi, lo) uint32 pair

_U32 = jnp.uint32
MASK16 = 0xFFFF


def u64(value: int) -> U64:
    """Lift a Python int (0 <= value < 2**64) to a scalar (hi, lo) pair."""
    value &= (1 << 64) - 1
    return (jnp.uint32(value >> 32), jnp.uint32(value & 0xFFFFFFFF))


def u64_from_u32(lo: jnp.ndarray) -> U64:
    """Zero-extend a uint32 array to a u64 pair."""
    lo = lo.astype(_U32)
    return (jnp.zeros_like(lo), lo)


def to_python_int(x: U64) -> int:
    """Collapse a scalar u64 pair back to a Python int (host-side only)."""
    hi, lo = x
    return (int(hi) << 32) | int(lo)


def u64_add(a: U64, b: U64) -> U64:
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(_U32)
    hi = a[0] + b[0] + carry
    return (hi, lo)


def _mul32_wide(x: jnp.ndarray, y: jnp.ndarray) -> U64:
    """Full 32x32 -> 64 multiply via 16-bit limbs (uint32 mul keeps low 32)."""
    x0 = x & MASK16
    x1 = x >> 16
    y0 = y & MASK16
    y1 = y >> 16
    p00 = x0 * y0
    p01 = x0 * y1
    p10 = x1 * y0
    p11 = x1 * y1
    mid = p01 + p10
    mid_carry = (mid < p01).astype(_U32)  # overflow past 2**32 in 2**16 units
    lo = p00 + ((mid & MASK16) << 16)
    lo_carry = (lo < p00).astype(_U32)
    hi = p11 + (mid >> 16) + (mid_carry << 16) + lo_carry
    return (hi, lo)


def u64_mul(a: U64, b: U64) -> U64:
    """Low 64 bits of a*b (wrapping), like C uint64 multiplication."""
    hi, lo = _mul32_wide(a[1], b[1])
    hi = hi + a[1] * b[0] + a[0] * b[1]
    return (hi, lo)


def u64_xor(a: U64, b: U64) -> U64:
    return (a[0] ^ b[0], a[1] ^ b[1])


def u64_rotl(a: U64, r: int) -> U64:
    """Rotate left by a static amount r in (0, 64)."""
    r %= 64
    if r == 0:
        return a
    hi, lo = a
    if r == 32:
        return (lo, hi)
    if r < 32:
        nhi = (hi << r) | (lo >> (32 - r))
        nlo = (lo << r) | (hi >> (32 - r))
        return (nhi, nlo)
    s = r - 32
    nhi = (lo << s) | (hi >> (32 - s))
    nlo = (hi << s) | (lo >> (32 - s))
    return (nhi, nlo)


def u64_shr(a: U64, r: int) -> U64:
    """Logical right shift by a static amount r in (0, 64)."""
    hi, lo = a
    if r == 0:
        return a
    if r == 32:
        return (jnp.zeros_like(hi), hi)
    if r < 32:
        nlo = (lo >> r) | (hi << (32 - r))
        nhi = hi >> r
        return (nhi, nlo)
    return (jnp.zeros_like(hi), hi >> (r - 32))


def u64_lt(a: U64, b: U64) -> jnp.ndarray:
    """Unsigned a < b, elementwise boolean."""
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def u64_select(cond: jnp.ndarray, a: U64, b: U64) -> U64:
    """Elementwise where(cond, a, b) on u64 pairs."""
    return (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))


def u64_mod_u32(a: U64, m: jnp.ndarray) -> jnp.ndarray:
    """a mod m for a runtime uint32 modulus m with m < 2**28.

    Long division in 4-bit chunks: the running remainder r < m < 2**28, so
    (r << 4) | nibble < 2**32 never overflows a uint32 lane.  16 unrolled
    steps of shift/or/remainder — pure VPU work, no 64-bit division needed.

    The 2**28 bound comfortably covers every Bloom filter length this codec
    produces (l < 0.33 * n and n = H*W <= 2**26 even at 8K), and is checked
    by the callers on the host side.
    """
    hi, lo = a
    m = m.astype(_U32)
    r = jnp.zeros_like(hi)
    for j in range(8):
        nib = (hi >> (28 - 4 * j)) & 0xF
        r = ((r << 4) | nib) % m
    for j in range(8):
        nib = (lo >> (28 - 4 * j)) & 0xF
        r = ((r << 4) | nib) % m
    return r


def u64_add_small_mod(a: jnp.ndarray, b: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod m where a, b < m < 2**28 (no overflow possible)."""
    s = a + b
    return jnp.where(s >= m, s - m, s)
