"""Batched GOP (group-of-pictures) device pipeline.

The per-frame host orchestration loop pays a host<->device round trip —
tens of ms of tunnel/PCIe latency — several times per frame.  This module
restructures bloom-mode encode/decode into *two device calls per GOP*
(keyframe + up to keyframe_interval-1 inter frames), with everything else
batched:

encode:
  phase A  — one jitted call: exact any-channel diff masks for the whole
             GOP, packed bits + change counts (single pull).
  (host)   — float64 parameter math per frame (p, k, l, activation
             threshold) exactly as the reference formulas require.
  phase B  — one jitted call: lane-masked Bloom insert + membership +
             witness compaction + np.packbits-compatible packing + exact
             changed-value compaction into a bucketed buffer (single
             pull).
  (host)   — struct/zlib record assembly.

decode:
  (host)   — record parsing, zlib values inflate.
  one jitted lax.scan over the GOP: unpack bitmap/witness, membership
  gather, witness expansion, value gather, frame chaining — returning all
  reconstructed frames in one pull.

Value buffers are bucketed to the next power of two of the GOP's max
change count, so transfer cost tracks content while compiled program
count stays logarithmic.

This is the TPU-native realization of the reference's designed-but-dead
inter-frame path (SURVEY.md §3.4 hot loops #3-#5).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from new_bloom_filter_repo_tpu.ops import bitpack
from new_bloom_filter_repo_tpu.ops.bloom_core import (
    MAX_LANES,
    bitmap_pad,
    insert_partial_lanes,
    membership_lanes,
    witness_compact,
)

KMAX = MAX_LANES


def _n8(n: int) -> int:
    return bitpack.padded_length(n)


def gop_masks_pairs(prev, curr):
    """Exact diff masks for (prev, curr) frame pairs — the shared body of
    :func:`gop_masks` and its dp-sharded variant (both operands shard
    over the frame axis; no boundary exchange needed).

    Returns (masks (B, n8) u8, packed (B, n8/8) u8, counts (B,) i32)."""
    neq = curr != prev
    if neq.ndim == 4:
        neq = jnp.any(neq, axis=-1)
    b = neq.shape[0]
    n = neq.shape[1] * neq.shape[2]
    masks = neq.reshape(b, n).astype(jnp.uint8)
    counts = jnp.sum(masks, axis=1, dtype=jnp.int32)
    pad = _n8(n) - n
    if pad:
        masks = jnp.pad(masks, ((0, 0), (0, pad)))
    packed = bitpack.pack_bits(masks)
    return masks, packed, counts


@jax.jit
def gop_masks(frames: jnp.ndarray):
    """Exact diff masks for consecutive frames.

    frames: (B+1, h, w[, c]) uint8 — frame 0 is the reconstruction base.
    Returns (masks (B, n8) u8 on device, packed (B, n8/8), counts (B,)).
    """
    return gop_masks_pairs(frames[:-1], frames[1:])


@partial(jax.jit, static_argnames=("l_pad", "vmax", "k_max"))
def gop_encode(masks, frames_curr, h1, h2, act, l, t_hi, t_lo, floor_k,
               *, l_pad: int, vmax: int, k_max: int = KMAX):
    """Batched Bloom encode of a GOP's inter frames.

    masks: (B, n8) u8 (only [:, :n] meaningful; n from hash tables).
    frames_curr: (B, h, w[, c]) uint8 — the frames whose changed values
      are gathered.
    l/t_hi/t_lo: (B,) u32; floor_k: (B,) i32.  Frames that are
    pass-through or empty should carry l=1, floor_k=0 (outputs ignored).

    Returns (packed_bitmaps (B, l_pad/8), packed_witness (B, n8/8),
             wcounts (B,), values (B, vmax, C) u8).
    """
    n = h1[0].shape[0]
    b = masks.shape[0]
    if frames_curr.ndim == 3:
        frames_flat = frames_curr.reshape(b, -1, 1)
    else:
        frames_flat = frames_curr.reshape(b, -1, frames_curr.shape[-1])
    c = frames_flat.shape[-1]

    def one(mask_row, frame_row, ll, th, tl, fk):
        bits = mask_row[:n]
        bit_array = insert_partial_lanes(bits, h1, h2, act, ll, th, tl,
                                         fk, k_max, l_pad)
        pmask = membership_lanes(bit_array, h1, h2, act, ll, th, tl,
                                 fk, k_max)
        witness, wcount = witness_compact(bits, pmask)
        # Changed-value compaction: pixel i with mask=1 lands at slot
        # cumsum-1, everything else drops into the void row.
        m32 = bits.astype(jnp.uint32)
        vidx = jnp.cumsum(m32) - m32
        slot = jnp.where(bits.astype(jnp.bool_), vidx, jnp.uint32(vmax))
        values = jnp.zeros((vmax + 1, c), dtype=jnp.uint8).at[slot].set(
            frame_row, mode="drop")[:vmax]
        pb = bitpack.pack_bits(bit_array)  # l_pad is a multiple of 128
        wit_padded = jnp.pad(witness, (0, _n8(n) - n)) if _n8(n) != n else witness
        pw = bitpack.pack_bits(wit_padded)
        return pb, pw, wcount, values

    return jax.vmap(one)(masks, frames_flat, l, t_hi, t_lo, floor_k)


@partial(jax.jit, static_argnames=("n", "vmax", "k_max"))
def gop_decode_fields(packed_bitmaps, packed_witness, values, flags,
                      h1, h2, act, l, t_hi, t_lo, floor_k,
                      *, n: int, vmax: int, k_max: int = KMAX):
    """Per-frame decode fields: (mask (B, n) u8, pix (B, n, C) u8).

    The frame-independent part of GOP decode (bitmap unpack, membership,
    witness expansion, value gather) — vmapped, so it frame-shards over a
    ``dp`` mesh axis (parallel/batch.make_gop_decode_fields_dp); only the
    tiny chain (:func:`gop_chain`) is sequential."""
    n8 = packed_bitmaps.shape[1] * 8

    def one(pb, pw, vals, flag, ll, th, tl, fk):
        bit_array = bitpack.unpack_bits(pb, n8)
        pmask = membership_lanes(bit_array, h1, h2, act, ll, th, tl,
                                 fk, k_max)
        witness = bitpack.unpack_bits(pw, n8)[:n]
        p32 = pmask.astype(jnp.uint32)
        widx = jnp.cumsum(p32) - p32
        decoded = jnp.where(pmask, witness[widx], jnp.uint8(0))
        mask = jnp.where(flag > 0, bit_array[:n], decoded)
        m32 = mask.astype(jnp.uint32)
        vidx = jnp.clip(jnp.cumsum(m32) - m32, 0, vmax - 1)
        pix = vals[vidx]                                  # (n, C)
        return mask, pix

    return jax.vmap(one)(packed_bitmaps, packed_witness, values, flags,
                         l, t_hi, t_lo, floor_k)


@jax.jit
def gop_chain(base, masks, pix):
    """Chain per-frame (mask, pixels) deltas from the decoded keyframe.

    base: (h, w[, c]) uint8; masks: (B, n) u8; pix: (B, n, C) u8.
    Returns frames (B, h, w[, c]) uint8."""
    shape = base.shape
    c = 1 if base.ndim == 2 else shape[-1]
    base_flat = base.reshape(-1, c)

    def step(prev, x):
        mask, p = x
        frame = jnp.where(mask.astype(jnp.bool_)[:, None], p, prev)
        return frame, frame

    _, frames = jax.lax.scan(step, base_flat, (masks, pix))
    return frames.reshape((masks.shape[0],) + shape)


@partial(jax.jit, static_argnames=("n", "vmax", "k_max", "passthrough_pad"))
def gop_decode(base, packed_bitmaps, packed_witness, values, flags,
               h1, h2, act, l, t_hi, t_lo, floor_k,
               *, n: int, vmax: int, k_max: int = KMAX,
               passthrough_pad: int = 0):
    """Batched GOP decode: fields (vmapped) + frame chaining on device.

    base: (h, w[, c]) uint8 — decoded keyframe the GOP starts from.
    packed_bitmaps: (B, n8/8) u8 — bitmap region (zero-padded; covers both
      Bloom bitmaps of length l and pass-through masks of length n).
    packed_witness: (B, n8/8) u8.
    values: (B, vmax, C) u8 — inflated changed values.
    flags: (B,) i32 — 1 where the record is pass-through (witness empty:
      the bitmap *is* the mask; improved_video_compressor.py:1012-1015).

    Returns frames (B, h, w[, c]) uint8.
    """
    masks, pix = gop_decode_fields(
        packed_bitmaps, packed_witness, values, flags,
        h1, h2, act, l, t_hi, t_lo, floor_k, n=n, vmax=vmax, k_max=k_max)
    return gop_chain(base, masks, pix)


def next_bucket(x: int, minimum: int = 1024) -> int:
    """Power-of-two bucket for value-buffer sizing."""
    b = minimum
    while b < x:
        b *= 2
    return b
