"""xxhash64 — pure-Python scalar reference and a vectorized JAX lane version.

The reference codec keys every Bloom-filter probe on
``xxh64(str(index), seed)`` — the ASCII decimal rendering of the pixel index
(reference: improved_video_compressor.py:77-78,94;
rational_bloom_filter.py:115-134).  Bitstream parity therefore requires
hashing variable-length decimal strings with exact xxh64 semantics.

Two implementations live here:

* :func:`xxh64` — a from-the-spec scalar Python implementation, used for
  host-side tooling and as an independent cross-check against the C
  ``xxhash`` wheel in tests.
* :func:`xxh64_decimal` — the TPU path: a branch-free, data-parallel xxh64
  over the decimal strings of a whole lane of uint32 indices at once, built
  on the uint32-pair u64 emulation in :mod:`.u64`.  Because decimal strings
  of uint32 indices are at most 10 bytes, only the short-input tail of
  xxh64 is needed (one optional 8-byte round, one optional 4-byte round, up
  to three single-byte rounds, then the avalanche), and every conditional
  becomes a lane select.

Hash values depend only on (index, seed), never on frame content, so per
video geometry the three lane tables (h1, h2, activation) are computed once
and reused for every frame — amortizing the string-hash cost to ~zero
(SURVEY.md §7 step 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from new_bloom_filter_repo_tpu.ops import u64 as u

# xxh64 primes from the specification.
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

_M64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# Scalar reference implementation (host side)
# ---------------------------------------------------------------------------

def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & _M64
    acc = _rotl(acc, 31)
    return (acc * P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    val = _round(0, val)
    acc ^= val
    return (acc * P1 + P4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar xxh64 digest of ``data`` with ``seed`` (spec-faithful)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M64
        v2 = (seed + P2) & _M64
        v3 = seed & _M64
        v4 = (seed - P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * P1 + P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & _M64
        h = (_rotl(h, 23) * P2 + P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M64
        h = (_rotl(h, 11) * P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M64
    h ^= h >> 29
    h = (h * P3) & _M64
    h ^= h >> 32
    return h


def xxh64_int(value: int, seed: int = 0) -> int:
    """xxh64 of the ASCII decimal rendering of ``value`` — reference probe."""
    return xxh64(str(value).encode("ascii"), seed)


# ---------------------------------------------------------------------------
# Vectorized JAX implementation over decimal strings of uint32 indices
# ---------------------------------------------------------------------------

_MAX_DIGITS = 10  # uint32 max is 4294967295 -> 10 digits


def _decimal_bytes(idx: jnp.ndarray):
    """MSB-first ASCII digit bytes of each index, zero-padded to 11 columns.

    Returns (bytes_list, length) where bytes_list[t] is a uint32 array of the
    t-th byte of str(idx) (0 where t >= length).
    """
    idx = idx.astype(jnp.uint32)
    # LSB-first digits.
    lsb = []
    v = idx
    for _ in range(_MAX_DIGITS):
        lsb.append(v % jnp.uint32(10))
        v = v // jnp.uint32(10)
    # Decimal length: 1 + #thresholds passed.
    length = jnp.ones_like(idx)
    for p in range(1, _MAX_DIGITS):
        length = length + (idx >= jnp.uint32(10 ** p)).astype(jnp.uint32)
    # MSB-first byte t = '0' + lsb[length-1-t] for t < length.
    out = []
    for t in range(_MAX_DIGITS + 1):
        sel = length.astype(jnp.int32) - 1 - t  # may be negative
        b = jnp.zeros_like(idx)
        for j in range(_MAX_DIGITS):
            b = jnp.where(sel == j, lsb[j], b)
        b = jnp.where(t < length, b + jnp.uint32(48), jnp.uint32(0))
        out.append(b)
    return out, length


def xxh64_decimal(idx: jnp.ndarray, seed: int) -> u.U64:
    """Vectorized ``xxh64(str(i), seed)`` for a lane of uint32 indices.

    Matches CPython ``xxhash.xxh64_intdigest(str(i), seed)`` bit-for-bit for
    every ``i`` in [0, 2**32) — the probe hash of the reference's
    index-keyed rational Bloom filters.
    """
    b, length = _decimal_bytes(idx)
    p1, p2, p3, p4, p5 = (u.u64(p) for p in (P1, P2, P3, P4, P5))

    # h = seed + P5 + len   (inputs are < 32 bytes: no stripe loop)
    h = u.u64_add(u.u64((seed + P5) & _M64), u.u64_from_u32(length))

    # Optional 8-byte round (iff length >= 8), over bytes [0:8] little-endian.
    w_lo = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
    w_hi = b[4] | (b[5] << 8) | (b[6] << 16) | (b[7] << 24)
    k1 = u.u64_mul((w_hi, w_lo), p2)
    k1 = u.u64_rotl(k1, 31)
    k1 = u.u64_mul(k1, p1)
    h8 = u.u64_xor(h, k1)
    h8 = u.u64_add(u.u64_mul(u.u64_rotl(h8, 27), p1), p4)
    ge8 = length >= 8
    h = u.u64_select(ge8, h8, h)

    # Optional 4-byte round (iff 4 <= length < 8), over bytes [0:4].
    h4 = u.u64_xor(h, u.u64_mul(u.u64_from_u32(w_lo), p1))
    h4 = u.u64_add(u.u64_mul(u.u64_rotl(h4, 23), p2), p3)
    in4 = (length >= 4) & (length < 8)
    h = u.u64_select(in4, h4, h)

    # Up to three single-byte rounds.  Remaining byte count and base offset:
    #   length >= 8 -> base 8, rem = length - 8   (<= 2)
    #   4 <= length < 8 -> base 4, rem = length - 4  (<= 3)
    #   length < 4 -> base 0, rem = length           (<= 3)
    rem = jnp.where(ge8, length - 8, jnp.where(length >= 4, length - 4, length))
    for j in range(3):
        byte_j = jnp.where(ge8, b[8 + j] if 8 + j <= _MAX_DIGITS else 0,
                           jnp.where(length >= 4, b[4 + j], b[j]))
        hj = u.u64_xor(h, u.u64_mul(u.u64_from_u32(byte_j), p5))
        hj = u.u64_mul(u.u64_rotl(hj, 11), p1)
        h = u.u64_select(j < rem, hj, h)

    # Avalanche.
    h = u.u64_xor(h, u.u64_shr(h, 33))
    h = u.u64_mul(h, p2)
    h = u.u64_xor(h, u.u64_shr(h, 29))
    h = u.u64_mul(h, p3)
    h = u.u64_xor(h, u.u64_shr(h, 32))
    return h
