"""Data-parallel rational-Bloom encode/decode cores.

These are the TPU-native replacements for the reference's per-index Python
hot loops #3-#5 (SURVEY.md §3.4; improved_video_compressor.py:234-253,
299-306):

* **insert pass** — every index computes its floor(k)+1 double-hash lanes
  and scatter-ORs into the bit array (masked by its input bit and the
  activation lane);
* **membership pass** — every index gathers its lanes and ANDs them;
* **witness compaction** — an exclusive prefix-sum over the pass mask
  places each passing index's original bit at its in-order witness slot;
* **witness expansion (decode)** — the same prefix-sum gathers witness
  bits back to passing indices; failing indices are guaranteed zeros.

Everything is statically shaped: the bit array is padded to
``bitmap_pad(n)`` (the analytic maximum of l = p·n·k/ln2 over p < P* is
~0.306·n, reached near p≈0.147), the witness to n.  Only the modulus l,
the activation threshold, and the array contents are runtime values, so
XLA compiles exactly one program per frame geometry and floor(k).

Parity notes (observable bitstream semantics, SURVEY.md §7 hard parts):
  - double hashing is (h1 + i*h2) mod l on u64 hashes, realized as
    a = h1 mod l, b = h2 mod l, lane_i = (a + i*b) mod l — exact.
  - the activation test is the float64 comparison
    xxh64(str(i), act_seed)/(2**64-1) < frac(k), reformulated as an exact
    integer compare against a host-computed threshold
    (models.bloom.activation_threshold_u64).
  - k is quantized to float32 *before* the filter is built, so encoder and
    decoder (which reads float32 k from the record,
    improved_video_compressor.py:938,986) always agree — fixing the
    reference's float64/float32 witness-desync hazard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from new_bloom_filter_repo_tpu.ops import u64 as u

MAX_MODULUS = 1 << 28  # u64_mod_u32 contract; l < 0.33*n keeps us far below


def bitmap_pad(n: int) -> int:
    """Static bit-array allocation covering every achievable l for input n.

    l = p·n·k(p)/ln2 with k(p) = log2((1-p)·ln²2/p) maximizes at ~0.3055·n
    (p ≈ 0.147); pad to 0.31·n plus slack and round up to a lane multiple.
    """
    return ((int(0.31 * n) + 136) + 127) // 128 * 128


def _lane_positions(a, b, l, floor_k):
    """Positions of the floor_k+1 double-hash lanes for every index.

    a = h1 mod l, b = h2 mod l (uint32, < l); lane i is (a + i*b) mod l,
    built incrementally with conditional subtraction (a + b < 2l < 2**29).
    Returns a list of floor_k+1 uint32 arrays.
    """
    positions = [a]
    cur = a
    for _ in range(floor_k):
        cur = u.u64_add_small_mod(cur, b, l)
        positions.append(cur)
    return positions


@partial(jax.jit, static_argnames=("floor_k", "l_pad"))
def encode_core(bits, h1, h2, act, l, t_hi, t_lo, *, floor_k: int, l_pad: int):
    """Bloom-encode a binary lane of length n.

    Args:
      bits: uint8[n] of 0/1 — the flattened binary input.
      h1, h2, act: (hi, lo) uint32[n] lane tables (see ops.hashtables).
      l: uint32 scalar — actual Bloom filter length (< 2**28, < l_pad).
      t_hi, t_lo: uint32 scalars — activation threshold (u64 pair).
      floor_k: static — floor of the float32-quantized k.
      l_pad: static — padded bit-array length (bitmap_pad(n)).

    Returns:
      bit_array: uint8[l_pad] — Bloom bitmap (valid in [0, l)).
      pass_mask: bool[n] — membership-test results after all inserts.
      witness: uint8[n] — in-order witness bits, valid in [0, witness_len).
      witness_len: int32 scalar.
    """
    n = bits.shape[0]
    bits = bits.astype(jnp.uint8)
    a = u.u64_mod_u32(h1, l)
    b = u.u64_mod_u32(h2, l)
    activated = u.u64_lt(act, (t_hi, t_lo))
    positions = _lane_positions(a, b, l, floor_k)

    # Insert pass: scatter-OR (max) each active lane of each set index.
    bit_array = jnp.zeros((l_pad,), dtype=jnp.uint8)
    for i, pos in enumerate(positions):
        val = bits if i < floor_k else bits * activated.astype(jnp.uint8)
        bit_array = bit_array.at[pos].max(val)

    # Membership pass: gather lanes, AND those that apply.
    pass_mask = jnp.ones((n,), dtype=jnp.bool_)
    for i, pos in enumerate(positions):
        hit = bit_array[pos].astype(jnp.bool_)
        if i < floor_k:
            pass_mask &= hit
        else:
            pass_mask &= hit | ~activated

    # Witness compaction: passing indices append their original bit in
    # ascending index order (improved_video_compressor.py:245-253).
    pass_u32 = pass_mask.astype(jnp.uint32)
    wpos = jnp.cumsum(pass_u32) - pass_u32  # exclusive prefix sum
    witness_len = jnp.sum(pass_u32).astype(jnp.int32)
    scatter_to = jnp.where(pass_mask, wpos, jnp.uint32(n))  # n -> dropped pad
    witness = jnp.zeros((n + 1,), dtype=jnp.uint8).at[scatter_to].set(bits)[:n]
    return bit_array, pass_mask, witness, witness_len


# ---------------------------------------------------------------------------
# Lane-masked variants: floor_k is a runtime value, lanes padded to a static
# k_max.  These power batched and sharded execution, where per-frame density
# (hence k) varies inside one compiled program.
# ---------------------------------------------------------------------------

MAX_LANES = 13  # k = log2(q*ln^2(2)/p) < 12.3 for p > 1e-4 -> floor_k <= 12


def lane_positions_masked(a, b, l, k_max: int):
    """k_max+1 double-hash lane positions (list of uint32[n])."""
    positions = [a]
    cur = a
    for _ in range(k_max):
        cur = u.u64_add_small_mod(cur, b, l)
        positions.append(cur)
    return positions


def insert_partial_lanes(bits, h1, h2, act, l, t_hi, t_lo, floor_k,
                         k_max: int, l_pad: int):
    """Scatter-OR partial bit array with runtime floor_k (single frame).

    Usable inside vmap/shard_map; returns uint8[l_pad].
    """
    bits = bits.astype(jnp.uint8)
    a = u.u64_mod_u32(h1, l)
    b = u.u64_mod_u32(h2, l)
    activated = u.u64_lt(act, (t_hi, t_lo))
    positions = lane_positions_masked(a, b, l, k_max)
    bit_array = jnp.zeros((l_pad,), dtype=jnp.uint8)
    for j, pos in enumerate(positions):
        active = jnp.where(jnp.int32(j) < floor_k, True,
                           (jnp.int32(j) == floor_k) & activated)
        bit_array = bit_array.at[pos].max(bits * active.astype(jnp.uint8))
    return bit_array


def membership_lanes(bit_array, h1, h2, act, l, t_hi, t_lo, floor_k,
                     k_max: int):
    """Pass mask with runtime floor_k (single frame): bool[n]."""
    n = h1[0].shape[0]
    a = u.u64_mod_u32(h1, l)
    b = u.u64_mod_u32(h2, l)
    activated = u.u64_lt(act, (t_hi, t_lo))
    positions = lane_positions_masked(a, b, l, k_max)
    pass_mask = jnp.ones((n,), dtype=jnp.bool_)
    for j, pos in enumerate(positions):
        hit = bit_array[pos].astype(jnp.bool_)
        active = jnp.where(jnp.int32(j) < floor_k, True,
                           (jnp.int32(j) == floor_k) & activated)
        pass_mask &= hit | ~active
    return pass_mask


def witness_compact(bits, pass_mask):
    """(witness uint8[n] padded, count int32) in ascending index order."""
    n = bits.shape[0]
    pass_u32 = pass_mask.astype(jnp.uint32)
    wpos = jnp.cumsum(pass_u32) - pass_u32
    count = jnp.sum(pass_u32).astype(jnp.int32)
    scatter_to = jnp.where(pass_mask, wpos, jnp.uint32(n))
    witness = jnp.zeros((n + 1,), dtype=jnp.uint8).at[scatter_to].set(
        bits.astype(jnp.uint8))[:n]
    return witness, count


def witness_expand(witness, pass_mask):
    """Reconstructed bits uint8[n] from witness + pass mask."""
    pass_u32 = pass_mask.astype(jnp.uint32)
    widx = jnp.cumsum(pass_u32) - pass_u32
    return jnp.where(pass_mask, witness[widx], jnp.uint8(0)).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("floor_k",))
def decode_core(bit_array, witness, h1, h2, act, l, t_hi, t_lo, *, floor_k: int):
    """Inverse of :func:`encode_core`.

    Args:
      bit_array: uint8[l_pad] — recorded Bloom bitmap, zero-padded.
      witness: uint8[n] — recorded witness bits, zero-padded.
      (rest as in encode_core; n is taken from the hash tables.)

    Returns uint8[n] — the reconstructed binary input: passing indices read
    the next witness bit, failing indices are exact zeros
    (improved_video_compressor.py:299-306).
    """
    n = h1[0].shape[0]
    a = u.u64_mod_u32(h1, l)
    b = u.u64_mod_u32(h2, l)
    activated = u.u64_lt(act, (t_hi, t_lo))
    positions = _lane_positions(a, b, l, floor_k)

    pass_mask = jnp.ones((n,), dtype=jnp.bool_)
    for i, pos in enumerate(positions):
        hit = bit_array[pos].astype(jnp.bool_)
        if i < floor_k:
            pass_mask &= hit
        else:
            pass_mask &= hit | ~activated

    pass_u32 = pass_mask.astype(jnp.uint32)
    widx = jnp.cumsum(pass_u32) - pass_u32
    return jnp.where(pass_mask, witness[widx], jnp.uint8(0)).astype(jnp.uint8)
