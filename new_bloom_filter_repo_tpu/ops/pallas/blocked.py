"""Blocked rational-Bloom Pallas kernels — the codec's hot loops on TPU.

Motivation (measured on TPU v5e): XLA's gather/scatter run at ~5-20M
random accesses/s, and the reference-layout Bloom filter needs ~8M random
bit accesses per 1080p frame — a hard ~0.5s/frame ceiling.  Mosaic has no
vector scatter/gather either.  The TPU-native answer is to *remove the
random access*: a **blocked** rational Bloom filter where the items of
each 1024-index block probe only that block's private m-bit sub-filter
(m = round(l / num_blocks), m <= 384).  Then every pass is dense
per-block work:

* lane positions: (h1 + j*h2) mod m on 24-bit table slices (VPU),
* insert: per-block position histogram via factored one-hot matmuls
  (12 x 32 = 384) on the MXU; ``count > 0`` gives the sub-filter bits,
* membership: the same factored one-hots contracted against the
  sub-filter,
* witness compaction: in-block exclusive prefix sums (a strictly-lower-
  triangular matmul on the MXU) and a byte-granular one-hot matmul that
  emits np.packbits-compatible bytes, each block's segment padded to its
  own byte boundary,
* changed-value compaction/expansion: same machinery on 24-bit-packed
  pixels (exact in f32).

Everything stays in VMEM per grid step; no HBM intermediates, no
scatter, no gather.  Mosaic constraints honored throughout: all values
are rank-2 (items live as (1, 1024) rows — 1D vectors and cross-lane
reshapes crash layout inference), casts route through int32, and small
matrices are carried as trailing block dims.

The rational-Bloom semantics (floor(k*) lanes + the fractional
activation lane, P*, the k/l formulas, global ascending witness order)
are unchanged from the reference design
(improved_video_compressor.py:99-138,161-196,234-253) — only the
position function is block-local, which is the documented BFV3 stream
profile (models/frame_codec.py).

All kernels run in interpreter mode on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IPB = 1024              # items (pixel indices) per block
MH, ML = 12, 32         # factored one-hot radices; m <= MH*ML = 384
MMAX = MH * ML
WIT_BYTES = IPB // 8    # per-block witness segment (128 B, byte-aligned)
BG = 8                  # blocks per grid step

_BF = jnp.bfloat16
_F32 = jnp.float32


def _interpret() -> bool:
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform != "tpu"
    return jax.default_backend() != "tpu"


def _to_u8(x):
    """Cast to uint8 via int32 (Mosaic lacks f32->u8 / bool->u8)."""
    return x.astype(jnp.int32).astype(jnp.uint8)


def _u8_to_bf(x):
    """Load-cast u8 -> bf16 via int32 (Mosaic lacks u8->bf16)."""
    return x.astype(jnp.int32).astype(_BF)


def _dotT(x, y):
    """(A, T) x (B, T) -> (A, B), contracting the trailing item axis."""
    return jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=_F32)


def _dot0(x, y):
    """(A, B) x (A, T) -> (B, T), contracting the leading axis."""
    return jax.lax.dot_general(
        x, y, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32)


def _onehot(v, rows: int):
    """(1, T) int32 -> (rows, T) bf16 one-hot."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, v.shape[1]), 0)
    return (iota == v).astype(_BF)


def _excl_prefix(x_row, lt_ref):
    """Exclusive prefix sum of a (1, IPB) int32 row via the strictly-
    lower-triangular (IPB, IPB) bf16 constant: out[j] = sum_{i<j} x[i].
    Exact: 0/1 entries, f32 accumulation, sums <= IPB."""
    xf = x_row.astype(_BF)
    return _dotT(xf, lt_ref[...]).astype(jnp.int32)  # (1, IPB)


def strict_lower_triangle():
    """Host-side constant for the prefix-sum matmuls: LT[j, i] = i < j."""
    i = np.arange(IPB)
    return (i[None, :] < i[:, None]).astype(np.float32)


def _lane_active(j, floor_k, act):
    """Lane-j applicability: j < floor_k, or the activation lane
    j == floor_k where the fractional test fired.  act: (1, IPB) bool."""
    always = jnp.int32(j) < floor_k
    extra = (jnp.int32(j) == floor_k) & act
    return always | extra


def _positions(a, b, m, k_lanes):
    """[(a + j*b) mod m for j in 0..k_lanes]; a, b: (1, IPB) < m."""
    out = [a]
    cur = a
    for _ in range(k_lanes):
        nxt = cur + b
        cur = jnp.where(nxt >= m, nxt - m, nxt)
        out.append(cur)
    return out


def _membership(words_bf, pos, floor_k, act, k_lanes):
    """Pass mask (1, IPB) bool given sub-filter words (MH, ML) bf16."""
    passes = None
    for j in range(k_lanes + 1):
        active = _lane_active(j, floor_k, act)
        xh = _onehot(pos[j] >> 5, MH)
        yl = _onehot(pos[j] & 31, ML)
        per_l = _dot0(words_bf, xh)                  # (ML, IPB)
        hit = jnp.sum(per_l * yl.astype(_F32), axis=0, keepdims=True) > 0
        term = hit | ~active
        passes = term if passes is None else passes & term
    return passes


# ---------------------------------------------------------------------------
# Encode kernel
# ---------------------------------------------------------------------------

def _encode_kernel(m_ref, fk_ref, lt_ref, bits_ref, a_ref, b_ref, act_ref,
                   vals_ref, words_ref, wit_ref, pass_ref, vseg_ref,
                   *, k_lanes, vh):
    f = pl.program_id(0)
    m = m_ref[f]
    floor_k = fk_ref[f]
    for g in range(BG):
        bits = bits_ref[0, g:g + 1, :].astype(jnp.int32)     # (1, IPB)
        a = a_ref[0, g:g + 1, :]
        b = b_ref[0, g:g + 1, :]
        act = act_ref[0, g:g + 1, :].astype(jnp.bool_)
        pos = _positions(a, b, m, k_lanes)

        # --- insert: factored one-hot histogram on the MXU
        counts = jnp.zeros((MH, ML), _F32)
        for j in range(k_lanes + 1):
            active = _lane_active(j, floor_k, act)
            w = (bits * active.astype(jnp.int32)).astype(_BF)
            xh = _onehot(pos[j] >> 5, MH) * w                # (MH, IPB)
            yl = _onehot(pos[j] & 31, ML)                    # (ML, IPB)
            counts = counts + _dotT(xh, yl)
        words_ref[0, g, :, :] = _to_u8(counts > 0)

        # --- membership
        passes = _membership((counts > 0).astype(_BF), pos, floor_k, act,
                             k_lanes)
        pass_ref[0, g:g + 1, :] = _to_u8(passes)

        # --- witness bytes (np.packbits bit order, per-block aligned)
        p32 = passes.astype(jnp.int32)
        cpos = _excl_prefix(p32, lt_ref)                     # (1, IPB)
        byte_idx = jnp.where(passes, cpos >> 3, WIT_BYTES)
        weight = jnp.int32(128) >> (cpos & 7)
        contrib = jnp.where(passes & (bits > 0), weight, 0)
        x16 = _onehot(byte_idx >> 3, 16) * contrib.astype(_BF)
        y8 = _onehot(byte_idx & 7, 8)
        wit_ref[0, g, :, :] = _to_u8(_dotT(x16, y8))         # (16, 8)

        # --- changed-value compaction.  24-bit pixels are routed as three
        # byte planes: the compile environment allows excess precision, so
        # a "f32" MXU matmul actually runs in bf16 and corrupts ints over
        # 2^8; bytes (<= 255) are bf16-exact with f32 accumulation.
        v = vals_ref[0, g:g + 1, :]                          # (1, IPB) i32
        slot = _excl_prefix(bits, lt_ref)
        sel = bits > 0
        xv = _onehot(jnp.where(sel, slot >> 5, vh + 1), vh)
        yv = _onehot(slot & 31, 32)
        vseg = jnp.zeros((vh, 32), jnp.int32)
        for plane in range(3):
            byte = ((v >> (8 * plane)) & 0xFF).astype(_BF)
            part = _dotT(xv * byte, yv).astype(jnp.int32)
            vseg = vseg | (part << (8 * plane))
        vseg_ref[0, g, :, :] = vseg                          # (vh, 32)


def blocked_encode(bits, a, b, act, vals, m, floor_k, *, k_lanes: int,
                   vh: int):
    """Blocked Bloom encode over a batch of frames.

    Args:
      bits: (F, NB, IPB) uint8 change-mask bits per block.
      a, b: (F, NB, IPB) int32 — h1 mod m, h2 mod m per frame.
      act:  (F, NB, IPB) uint8 — activation-lane test results.
      vals: (F, NB, IPB) int32 — 24-bit packed pixel values.
      m:    (F,) int32 per-frame block filter bits (<= MMAX).
      floor_k: (F,) int32.
      k_lanes: static — max floor_k in the batch (k_lanes+1 lanes run).
      vh: static — value bucket rows; vh*32 slots/block must cover the
        largest per-block change count in the batch.

    Returns (words (F,NB,MMAX) u8, wit (F,NB,128) u8, wcnt (F,NB) i32,
             vseg (F,NB,vh*32) i32, vcnt (F,NB) i32).
    """
    f_, nb, _ = bits.shape
    lt = jnp.asarray(strict_lower_triangle(), dtype=_BF)
    kern = functools.partial(_encode_kernel, k_lanes=k_lanes, vh=vh)
    words, wit, passes, vseg = pl.pallas_call(
        kern,
        grid=(f_, nb // BG),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # m (F,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # floor_k (F,)
            pl.BlockSpec((IPB, IPB), lambda f, g: (0, 0)),   # LT constant
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BG, MH, ML), lambda f, g: (f, g, 0, 0)),
            pl.BlockSpec((1, BG, 16, 8), lambda f, g: (f, g, 0, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, vh, 32), lambda f, g: (f, g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f_, nb, MH, ML), jnp.uint8),
            jax.ShapeDtypeStruct((f_, nb, 16, 8), jnp.uint8),
            jax.ShapeDtypeStruct((f_, nb, IPB), jnp.uint8),
            jax.ShapeDtypeStruct((f_, nb, vh, 32), jnp.int32),
        ],
        interpret=_interpret(),
    )(m, floor_k, lt, bits, a, b, act, vals.astype(jnp.int32))
    wcnt = jnp.sum(passes.astype(jnp.int32), axis=2)
    vcnt = jnp.sum(bits.astype(jnp.int32), axis=2)
    return (words.reshape(f_, nb, MMAX), wit.reshape(f_, nb, WIT_BYTES),
            wcnt, vseg.reshape(f_, nb, vh * 32), vcnt)


# ---------------------------------------------------------------------------
# Decode kernels
# ---------------------------------------------------------------------------

def _member_kernel(m_ref, fk_ref, flag_ref, words_ref, a_ref, b_ref,
                   act_ref, pass_ref, *, k_lanes):
    f = pl.program_id(0)
    m = m_ref[f]
    floor_k = fk_ref[f]
    passthrough = flag_ref[f]
    for g in range(BG):
        words = _u8_to_bf(words_ref[0, g, :, :])             # (MH, ML)
        a = a_ref[0, g:g + 1, :]
        b = b_ref[0, g:g + 1, :]
        act = act_ref[0, g:g + 1, :].astype(jnp.bool_)
        pos = _positions(a, b, m, k_lanes)
        passes = _membership(words, pos, floor_k, act, k_lanes)
        passes = passes & (passthrough == 0)
        pass_ref[0, g:g + 1, :] = _to_u8(passes)


def blocked_membership(words, a, b, act, m, floor_k, flags, *, k_lanes: int):
    """Membership pass for decode.

    words: (F, NB, MMAX) u8 sub-filter bits; flags: (F,) i32 — 1 for
    pass-through/empty records (mask used verbatim; passes forced to 0).
    Returns (pass (F,NB,IPB) u8, wcnt (F,NB) i32)."""
    f_, nb, _ = words.shape
    kern = functools.partial(_member_kernel, k_lanes=k_lanes)
    passes = pl.pallas_call(
        kern,
        grid=(f_, nb // BG),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BG, MH, ML), lambda f, g: (f, g, 0, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
        ],
        out_specs=pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
        out_shape=jax.ShapeDtypeStruct((f_, nb, IPB), jnp.uint8),
        interpret=_interpret(),
    )(m, floor_k, flags, words.reshape(f_, nb, MH, ML), a, b, act)
    wcnt = jnp.sum(passes.astype(jnp.int32), axis=2)
    return passes, wcnt


def _expand_kernel(flag_ref, lt_ref, pass_ref, wit_ref, raw_ref, vseg_ref,
                   mask_ref, vals_ref, *, vh):
    f = pl.program_id(0)
    for g in range(BG):
        passes = pass_ref[0, g:g + 1, :].astype(jnp.bool_)   # (1, IPB)
        seg2d = _u8_to_bf(wit_ref[0, g, :, :])               # (16, 8)
        p32 = passes.astype(jnp.int32)
        widx = _excl_prefix(p32, lt_ref)                     # (1, IPB)
        x16 = _onehot(widx >> 6, 16)
        y8 = _onehot((widx >> 3) & 7, 8)
        per_l = _dot0(seg2d, x16)                            # (8, IPB)
        byte_t = jnp.sum(per_l * y8.astype(_F32), axis=0,
                         keepdims=True).astype(jnp.int32)
        bit_t = (byte_t >> (7 - (widx & 7))) & 1
        decoded = jnp.where(passes, bit_t, 0)
        mask = jnp.where(flag_ref[f] > 0,
                         raw_ref[0, g:g + 1, :].astype(jnp.int32), decoded)
        mask_ref[0, g:g + 1, :] = _to_u8(mask)
        # value expansion — byte planes for bf16-exactness (see encode)
        slot = _excl_prefix(mask, lt_ref)
        xv = _onehot(slot >> 5, vh)
        yv = _onehot(slot & 31, 32).astype(_F32)
        vseg = vseg_ref[0, g, :, :]                          # (vh, 32) i32
        val_t = jnp.zeros((1, slot.shape[1]), jnp.int32)
        for plane in range(3):
            pbyte = ((vseg >> (8 * plane)) & 0xFF).astype(_BF)
            per_v = _dot0(pbyte, xv)                         # (32, IPB)
            b_t = jnp.sum(per_v * yv, axis=0,
                          keepdims=True).astype(jnp.int32)
            val_t = val_t | (b_t << (8 * plane))
        vals_ref[0, g:g + 1, :] = jnp.where(mask > 0, val_t, 0)


def blocked_expand(passes, wit, raw_mask, flags, vseg, *, vh: int):
    """Witness + value expansion for decode.

    passes: (F,NB,IPB) u8 from blocked_membership; wit: (F,NB,128) u8
    per-block witness segments (host-sliced); raw_mask: (F,NB,IPB) u8
    unpacked mask bits for pass-through records; flags: (F,) i32;
    vseg: (F,NB,vh*32) i32 value segments.
    Returns (mask (F,NB,IPB) u8, vals (F,NB,IPB) i32)."""
    f_, nb, _ = passes.shape
    lt = jnp.asarray(strict_lower_triangle(), dtype=_BF)
    kern = functools.partial(_expand_kernel, vh=vh)
    return pl.pallas_call(
        kern,
        grid=(f_, nb // BG),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((IPB, IPB), lambda f, g: (0, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, 16, 8), lambda f, g: (f, g, 0, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, vh, 32), lambda f, g: (f, g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, BG, IPB), lambda f, g: (f, g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f_, nb, IPB), jnp.uint8),
            jax.ShapeDtypeStruct((f_, nb, IPB), jnp.int32),
        ],
        interpret=_interpret(),
    )(flags, lt, passes, wit.reshape(f_, nb, 16, 8), raw_mask,
      vseg.astype(jnp.int32).reshape(f_, nb, vh, 32))
