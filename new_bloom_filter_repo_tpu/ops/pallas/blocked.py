"""Blocked rational-Bloom Pallas kernels — the codec's hot loops on TPU.

Motivation (measured on TPU v5e): XLA's gather/scatter run at ~5-20M
random accesses/s, and the reference-layout Bloom filter needs ~8M random
bit accesses per 1080p frame — a hard ~0.5s/frame ceiling.  Mosaic has no
vector scatter/gather either.  The TPU-native answer is to *remove the
random access*: a **blocked** rational Bloom filter where the items of
each 1024-index block probe only that block's private m-bit sub-filter
(m = round(l / num_blocks), m <= 384).  Then every pass is dense
whole-register work on (8, 1024) tiles:

* lane positions: (h1 + j*h2) mod m on 24-bit table slices (VPU),
* insert: the sub-filter lives as 12 u32 words per block; each word is a
  masked select + lane-halving OR-reduce — no matmuls, no scatter,
* membership: per-item word select (12-way compare chain) + bit test,
* witness/value compaction: in-block exclusive prefix (roll/add ladder)
  followed by a **monotone butterfly routing network** (10 log-shift
  stages, LSB->MSB) that packs kept elements to the lane front —
  conflict-free for monotone shifts (property-tested),
* witness packing: per-32-lane-group weighted prefix emitting
  np.packbits-compatible u32 words (byteswapped to bytes in XLA),
* expansion (decode): the same network replayed in reverse from
  take-masks recomputed forward from the pass mask.

Everything stays in registers/VMEM per grid step; zero HBM
intermediates, zero scatter/gather, zero K-bound matmuls.  Mosaic
constraints honored: all values rank-2, no cross-lane reshapes, casts
via int32, static-shift rolls only.

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IPB = 1024              # items (pixel indices) per block
NW = 12                 # u32 sub-filter words per block
MMAX = NW * 32          # = 384: max per-block filter bits
WIT_BYTES = IPB // 8    # per-block witness segment (128 B, byte-aligned)
WW = IPB // 32          # witness u32 words per block (32)
AUXW = 128              # encode aux output lanes (one native lane tile):
                        # WW witness words + 2 counts + zero padding
BG = 8                  # blocks per grid step

_I32 = jnp.int32
_STAGES = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def _tile_blocks(nb: int) -> int:
    """Tile height (blocks per grid step) for a batch with nb blocks.

    Grid-step fixed overhead (~2us/step measured on v5e) dominates the
    lighter kernels at BG=8; doubling the tile height nearly halves it
    (tg sweep at 120x1080p: 16 -> 77 ms, 64 -> 63 ms for expand+chain).
    Outputs are bit-identical for any tile height (block rows are
    independent), so this is purely a dispatch-shape choice.  nb is
    always a multiple of BG (geometry pads to SUPER = IPB*BG); the
    pipeline pads large batches to a multiple of 64 on the kernel block
    axis (blocked_pipeline.blocked_tables ``nbk``) so the larger tiles
    apply."""
    for tg in (64, 32, 16, BG):
        if nb % tg == 0:
            return tg
    return BG


def _interpret() -> bool:
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform != "tpu"
    return jax.default_backend() != "tpu"


def _to_u8(x):
    """Cast to uint8 via int32 (Mosaic lacks f32->u8 / bool->u8)."""
    return x.astype(_I32).astype(jnp.uint8)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(_I32, shape, 1)


def _lane_active(j, floor_k, act):
    """Lane-j applicability: j < floor_k, or the activation lane
    j == floor_k where the fractional test fired."""
    always = _I32(j) < floor_k
    extra = (_I32(j) == floor_k) & act
    return always | extra


def _positions(a, b, m, k_lanes):
    """[(a + j*b) mod m for j in 0..k_lanes]; a, b: (BG, IPB) < m."""
    out = [a]
    cur = a
    for _ in range(k_lanes):
        nxt = cur + b
        cur = jnp.where(nxt >= m, nxt - m, nxt)
        out.append(cur)
    return out


def excl_prefix(x):
    """Row-wise exclusive prefix sum of (BG, IPB) int32 via a roll/add
    ladder along lanes (rows are independent blocks)."""
    lane = _lane_iota(x.shape)
    acc = x
    for s in _STAGES:
        acc = acc + jnp.where(lane >= s, jnp.roll(acc, s, axis=1), 0)
    return acc - x


def _or_reduce_lanes(x):
    """(BG, IPB) int32 -> (BG, 1): bitwise OR of every lane (halving)."""
    for s in _STAGES[::-1]:
        x = x | jnp.roll(x, -s, axis=1)
    return x[:, 0:1]


def compact_butterfly(payloads, kept, shifts):
    """Monotone compaction: move kept elements to the lane front in order.

    payloads: list of (BG, IPB) int32 arrays routed identically.
    kept: (BG, IPB) bool; shifts: (BG, IPB) int32 = lane - dest.
    LSB->MSB log-shift stages; conflict-free for monotone shifts.
    Masks travel as int32 0/1 (Mosaic cannot roll i1 vregs).
    """
    lane = _lane_iota(kept.shape)
    v = list(payloads)
    k = kept.astype(_I32)
    r = shifts
    for s in _STAGES:
        move = k * ((r & s) != 0).astype(_I32)
        arrive = (jnp.roll(move, -s, axis=1)
                  * (lane < IPB - s).astype(_I32)) > 0
        v = [jnp.where(arrive, jnp.roll(x, -s, axis=1), x) for x in v]
        r = jnp.where(arrive, jnp.roll(r, -s, axis=1) - s, r)
        k = jnp.where(arrive, 1, k * (1 - move))
    return v, k > 0


def _take_masks(kept, shifts):
    """Forward pass recording per-stage arrival masks (for expansion)."""
    lane = _lane_iota(kept.shape)
    k = kept.astype(_I32)
    r = shifts
    takes = []
    for s in _STAGES:
        move = k * ((r & s) != 0).astype(_I32)
        arrive_i = jnp.roll(move, -s, axis=1) * (lane < IPB - s).astype(_I32)
        takes.append(arrive_i)
        arrive = arrive_i > 0
        r = jnp.where(arrive, jnp.roll(r, -s, axis=1) - s, r)
        k = jnp.where(arrive, 1, k * (1 - move))
    return takes


def expand_butterfly(payloads, kept):
    """Inverse of :func:`compact_butterfly`: distribute the lane-front
    segment back to the kept positions (replay take-masks in reverse)."""
    lane = _lane_iota(kept.shape)
    cpos = excl_prefix(kept.astype(_I32))
    takes = _take_masks(kept, lane - cpos)
    v = list(payloads)
    for s, take in zip(_STAGES[::-1], takes[::-1]):
        t_shift = (jnp.roll(take, s, axis=1)
                   * (lane >= s).astype(_I32)) > 0
        v = [jnp.where(t_shift, jnp.roll(x, s, axis=1), x) for x in v]
    return v


def _insert_words(pos_list, bits, floor_k, act, nw):
    """Sub-filter u32 words (BG, nw) via masked OR-reduces.

    The lane-applicability test is folded into the weight once per hash
    lane (``wmasked``), so the per-word loop pays only the word-select
    compare — (k+1)·nw fewer ops per tile than re-masking per word."""
    bitsb = bits.astype(jnp.bool_)
    weights = []
    his = []
    wmasked = []
    for j, pos in enumerate(pos_list):
        weight = jax.lax.shift_left(_I32(1), 31 - (pos & 31))
        weights.append(weight)
        his.append(pos >> 5)
        active = _lane_active(j, floor_k, act) & bitsb
        wmasked.append(jnp.where(active, weight, 0))
    cols = []
    for w in range(nw):
        m_w = jnp.zeros_like(bits)
        for j in range(len(pos_list)):
            m_w = m_w | jnp.where(his[j] == w, wmasked[j], 0)
        cols.append(_or_reduce_lanes(m_w))
    return jnp.concatenate(cols, axis=1), his, weights   # (BG, nw)


def _membership_words(words, his, weights, floor_k, act, k_lanes, nw):
    """Pass mask (BG, IPB) given sub-filter words (BG, nw) i32."""
    passes = None
    for j in range(k_lanes + 1):
        wsel = jnp.zeros_like(his[j])
        for w in range(nw):
            wsel = wsel | jnp.where(his[j] == w, words[:, w:w + 1], 0)
        hit = (wsel & weights[j]) != 0
        active = _lane_active(j, floor_k, act)
        term = hit | ~active
        passes = term if passes is None else passes & term
    return passes


def _check_words(words, nw: int):
    """Trace-time guard on the packed-words contract.

    blocked_membership(_h) changed their public ``words`` form from
    (F,NB,MMAX) u8 expanded bits to (F,NB,>=nw) i32 packed words; a
    stale caller passing the old u8 form would silently be sliced to
    [:, :, :nw] and decode garbage.  Static dtype/width checks make
    that fail loudly instead."""
    if words.dtype != _I32:
        raise TypeError(
            f"words must be int32 PACKED sub-filter words (got "
            f"{words.dtype}); convert expanded bits with bits_to_words32")
    if words.shape[-1] < nw or words.shape[-1] > NW:
        raise ValueError(
            f"words last axis must be in [{nw}, {NW}] packed u32 words, "
            f"got {words.shape[-1]} (expanded-bit arrays are {MMAX} wide)")


def nw_bucket(max_m: int) -> int:
    """Static sub-filter word count covering the chunk's largest m."""
    need = max(1, (max_m + 31) // 32)
    for b in (4, 8, NW):
        if need <= b:
            return b
    return NW


def k_bucket(max_floor_k: int) -> int:
    """Static deterministic-lane count covering the chunk's largest
    floor(k).

    Every distinct k_lanes is a fresh Mosaic compile (1-4 min through
    this rig's remote compile server); content-dependent k made noisy
    clips recompile nearly every chunk (the 960 s bloom-planar
    noise_storm encode, VERDICT r2 weak #2/#5).  Rounding up to a small
    bucket set is semantics-preserving — lanes beyond a frame's fk are
    gated off per-frame in the kernels (_lane_active) — and caps the
    variant count at 8 per (vh, nw) pair."""
    for b in (2, 4, 6, 8, 12, 16, 24):
        if max_floor_k <= b:
            return b
    return 32


def _pack_group32(bits_at_lanes, valid):
    """Pack lane bits into u32 words at lanes 31 mod 32 (packbits order):
    weight 1 << (31 - lane%32), 5-stage in-group prefix."""
    lane = _lane_iota(bits_at_lanes.shape)
    w = jnp.where(valid, jax.lax.shift_left(
        bits_at_lanes.astype(_I32), 31 - (lane & 31)), 0)
    acc = w
    for s in (1, 2, 4, 8, 16):
        acc = acc | jnp.where((lane & 31) >= s, jnp.roll(acc, s, axis=1), 0)
    return acc  # valid at lanes where lane % 32 == 31


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _fold_stride32(acc):
    """Gather the packed words living at lanes 31 (mod 32) to lanes
    0..31 — a STATIC monotone compaction: element k needs a left shift
    of 31*(k+1), decomposed as one unconditional roll of 31 plus masked
    rolls of 31*s for the set bits s of k.  The routing schedule is
    collision-free and the arrival lanes at stage s have the closed
    form {l : (l&31)&s != 0, (l&31)&(s-1) == 0, (l>>5) < s} — an
    element k = h + r (h = k & ~(s-1), r = k & (s-1)) sits at lane
    h + 32r after its stage-s move (both verified exhaustively against
    a positional simulation).  6 rolls + 5 iota-mask selects — vs.
    writing the full (tg, IPB) array to HBM and strided-gathering 1/32
    of it back."""
    lane = _lane_iota(acc.shape)
    lo = lane & 31
    acc = jnp.roll(acc, -31, axis=1)
    for s in (16, 8, 4, 2, 1):
        arrive = (((lo & s) != 0) & ((lo & (s - 1)) == 0)
                  & ((lane >> 5) < s))
        acc = jnp.where(arrive, jnp.roll(acc, -31 * s, axis=1), acc)
    return acc                       # words at lanes 0..WW-1, full width


# NOTE: an in-kernel inverse fold ("unfold": packed words fanned back to
# per-lane group words via 6 static rolls + a 5-stage group broadcast)
# was implemented and measured for a packed pass-mask interchange
# between membership and expansion; it cost ~15 ms/120x1080p — more
# than the u8 traffic it saved — and was removed.  The fold schedule's
# inverse has the closed-form arrival lanes
# {l : (l>>5)&s != 0, l>>5 < 2s, (l&31)&(2s-1) == 0} if ever needed.


def _encode_body(m, floor_k, bits, a, b, act, vals,
                 words_ref, aux_ref, valc_ref, k_lanes, nw, vh):
    lane = _lane_iota(bits.shape)
    pos = _positions(a, b, m, k_lanes)
    words, his, weights = _insert_words(pos, bits, floor_k, act, nw)
    words_ref[0] = words

    passes = _membership_words(words, his, weights, floor_k, act,
                               k_lanes, nw)

    # witness: compact the original bits of passing items, pack to words
    cpos = excl_prefix(passes.astype(_I32))
    (wbits,), wk = compact_butterfly([bits], passes, lane - cpos)
    folded = _fold_stride32(_pack_group32(wbits, wk))     # (tg, WW)

    # values: compact packed pixels of changed items
    slot = excl_prefix(bits)
    (vc,), _ = compact_butterfly([vals], bits.astype(jnp.bool_),
                                 lane - slot)
    valc_ref[0] = vc[:, : max(vh * 32, AUXW)]

    # aux lanes 0..31: witness words; lane 32: witness count (total
    # passes); lane 33: value count (total set bits); rest zero.
    # Packing the tiny per-block scalars into spare lanes avoids a
    # (tg, IPB)-wide passes output whose only consumer was a lane-sum.
    # The totals live at lane IPB-1 of the inclusive prefixes; a roll
    # lands them on their aux lane (lane-1 slices crash the Mosaic
    # compiler, so everything stays full-width until the final
    # 128-lane-aligned store).
    wtot = jnp.roll(cpos + passes.astype(_I32), WW + 1, axis=1)
    vtot = jnp.roll(slot + bits, WW + 2, axis=1)
    aux = jnp.where(lane < WW, folded, 0)
    aux = jnp.where(lane == WW, wtot, aux)
    aux = jnp.where(lane == WW + 1, vtot, aux)
    aux_ref[0] = aux[:, :AUXW]


def _encode_kernel(m_ref, fk_ref, bits_ref, a_ref, b_ref, act_ref,
                   vals_ref, words_ref, aux_ref, valc_ref,
                   *, k_lanes, nw, vh):
    f = pl.program_id(0)
    _encode_body(m_ref[f], fk_ref[f], bits_ref[0].astype(_I32),
                 a_ref[0], b_ref[0], act_ref[0].astype(jnp.bool_),
                 vals_ref[0], words_ref, aux_ref, valc_ref,
                 k_lanes, nw, vh)


def _imin():
    """int32 sign bit, constructed in-trace (a module-level jnp scalar
    would be a captured pallas constant)."""
    return _I32(-2147483648)


def _fast_mod(h, m):
    """h mod m for 0 <= h < 2^24, 1 <= m <= MMAX, via f32 reciprocal.

    Integer division is multi-cycle on the VPU (the plain `%` costs
    ~23 ms per 120x1080p frames); a reciprocal multiply with two
    exact-integer corrections is bit-identical: f32 holds h exactly
    (< 2^24), the quotient estimate is off by at most 1, and the
    remainder is corrected into [0, m) with integer ops.

    PRECONDITION: m == 1, a power of two, or m >= 16.  For m in 2..15
    the one-step quotient-error bound only holds under correctly
    rounded f32 ops (a 1-ulp divide could reach error ~1.0 at m=3);
    callers must not feed such m (the codec never emits m < MIN_M=16 —
    BlockedDecoder rejects them at stream-parse time)."""
    rm = 1.0 / m.astype(jnp.float32)
    q = jnp.floor(h.astype(jnp.float32) * rm).astype(_I32)
    r = h - q * m
    r = jnp.where(r < 0, r + m, r)
    return jnp.where(r >= m, r - m, r)


def _hash_prelude(m, thi_x, tlo_x, h1, h2, ahi, alo):
    """In-kernel position + activation math from the per-geometry hash
    tables: a/b = h mod m, act = (u64 activation hash < threshold) via
    xor-bias unsigned compares on i32 bit patterns.  Removes the
    (F,NB,IPB)x3 materialized tables (~375 MB per 15x1080p chunk) the
    XLA prelude (_frame_mod_tables) writes and the kernels re-read."""
    a = _fast_mod(h1, m)
    b = _fast_mod(h2, m)
    hix = ahi ^ _imin()
    lox = alo ^ _imin()
    act = (hix < thi_x) | ((hix == thi_x) & (lox < tlo_x))
    return a, b, act


def _encode_kernel_h(m_ref, fk_ref, thi_ref, tlo_ref, bits_ref, h1_ref,
                     h2_ref, ahi_ref, alo_ref, vals_ref, words_ref,
                     aux_ref, valc_ref, *, k_lanes, nw, vh):
    # grid is (block-group, frame) with the FRAME axis innermost so the
    # per-geometry hash-table blocks stay resident across the whole frame
    # loop (Mosaic skips re-fetch for unchanged block indices) — the
    # f-outer order re-read ~4 GB of tables per 120x1080p batch.
    f = pl.program_id(1)
    m = m_ref[f]
    a, b, act = _hash_prelude(m, thi_ref[f] ^ _imin(),
                              tlo_ref[f] ^ _imin(),
                              h1_ref[...], h2_ref[...], ahi_ref[...],
                              alo_ref[...])
    _encode_body(m, fk_ref[f], bits_ref[0].astype(_I32), a, b, act,
                 vals_ref[0], words_ref, aux_ref, valc_ref,
                 k_lanes, nw, vh)


def _member_body(m, floor_k, passthrough, words, a, b, act, pass_ref,
                 k_lanes, nw):
    pos = _positions(a, b, m, k_lanes)
    his = [p >> 5 for p in pos]
    weights = [jax.lax.shift_left(_I32(1), 31 - (p & 31)) for p in pos]
    passes = _membership_words(words, his, weights, floor_k, act,
                               k_lanes, nw)
    passes = passes & (passthrough == 0)
    # NOTE: a packed (32-word) pass output was tried and reverted — the
    # in-kernel unfold on the expand side cost ~15 ms/120x1080p, more
    # than the 242 MB of u8 traffic it saved (~8 ms); the plain byte
    # mask is the measured optimum.
    pass_ref[0] = _to_u8(passes)


def _member_kernel(m_ref, fk_ref, flag_ref, words_ref, a_ref, b_ref,
                   act_ref, pass_ref, *, k_lanes, nw):
    f = pl.program_id(0)
    _member_body(m_ref[f], fk_ref[f], flag_ref[f], words_ref[0],
                 a_ref[0], b_ref[0], act_ref[0].astype(jnp.bool_),
                 pass_ref, k_lanes, nw)


def _member_kernel_h(m_ref, fk_ref, thi_ref, tlo_ref, flag_ref,
                     words_ref, h1_ref, h2_ref, ahi_ref, alo_ref,
                     pass_ref, *, k_lanes, nw):
    # grid stays (frame, block-group): unlike encode, the f-inner order
    # measured ~2x SLOWER here (130 vs 68 ms / 120x1080p) — the words
    # input dominates traffic and its f-strided fetch pattern defeats
    # the pipeliner, while the table re-fetch it would save is smaller.
    f = pl.program_id(0)
    m = m_ref[f]
    a, b, act = _hash_prelude(m, thi_ref[f] ^ _imin(),
                              tlo_ref[f] ^ _imin(),
                              h1_ref[...], h2_ref[...], ahi_ref[...],
                              alo_ref[...])
    _member_body(m, fk_ref[f], flag_ref[f], words_ref[0], a, b, act,
                 pass_ref, k_lanes, nw)


def _expand_chain_kernel(flag_ref, pass_ref, witw_ref, raw_ref, vseg_ref,
                         base_ref, out_ref, run_ref, *, vh):
    """Fused witness decode + value expansion + frame chaining.

    Grid is (block-group, frame) with the FRAME axis innermost: the
    running reconstruction for this block group lives in VMEM scratch
    (``run_ref``) across the whole frame sequence, so the sequential
    chain costs zero extra HBM passes (vs. the separate lax.scan the
    unfused path runs over (F, n) mask/value arrays).

    The witness decode replaces the unfused path's 32-word unpack chain
    + butterfly expansion with a direct rank-indexed word select: a
    passing lane with in-block rank r reads bit (31 - r%32) of witness
    word r/32 — half the vector ops, bit-identical output.
    """
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        run_ref[...] = base_ref[...]

    passes = pass_ref[0].astype(jnp.bool_)            # (BG, IPB)
    witw = witw_ref[0]                                # (BG, WW) i32

    cpos = excl_prefix(passes.astype(_I32))           # rank among passes
    whi = cpos >> 5
    wsel = jnp.zeros_like(cpos)
    for w in range(WW):
        wsel = wsel | jnp.where(whi == w, witw[:, w:w + 1], 0)
    wbit = jax.lax.shift_right_logical(wsel, 31 - (cpos & 31)) & 1
    decoded = jnp.where(passes, wbit, 0)
    mask = jnp.where(flag_ref[f] > 0, raw_ref[0].astype(_I32), decoded)

    # value expansion: pad the value segment to lane width in-register
    vseg = vseg_ref[0]                                # (BG, vh*32) i32
    if vh * 32 < IPB:
        vseg = jnp.pad(vseg, ((0, 0), (0, IPB - vh * 32)))
    (at_mask,) = expand_butterfly([vseg], mask.astype(jnp.bool_))

    new = jnp.where(mask > 0, at_mask, run_ref[...])
    run_ref[...] = new
    out_ref[0] = new


def _expand_kernel(flag_ref, pass_ref, witw_ref, raw_ref, vseg_ref,
                   mask_ref, vals_ref):
    f = pl.program_id(0)
    passes = pass_ref[0].astype(jnp.bool_)            # (BG, IPB)
    witw = witw_ref[0]                                # (BG, WW) i32
    lane = _lane_iota(passes.shape)

    # unpack witness words to bits at compact lanes
    wsel = jnp.zeros_like(lane)
    grp = lane >> 5
    for w in range(WW):
        wsel = wsel | jnp.where(grp == w, witw[:, w:w + 1], 0)
    seg_bits = (jax.lax.shift_right_logical(
        wsel, 31 - (lane & 31)) & 1)

    (at_pass,) = expand_butterfly([seg_bits], passes)
    decoded = jnp.where(passes, at_pass, 0)
    mask = jnp.where(flag_ref[f] > 0, raw_ref[0].astype(_I32), decoded)
    mask_ref[0] = _to_u8(mask)

    # value expansion: vseg already padded to (BG, IPB)
    (at_mask,) = expand_butterfly([vseg_ref[0]], mask.astype(jnp.bool_))
    vals_ref[0] = jnp.where(mask > 0, at_mask, 0)


# ---------------------------------------------------------------------------
# Wrappers.  Sub-filter words travel PACKED ((..., nw) i32) end to end:
# the encode kernel emits them, the membership kernels consume them, and
# hosts move 12 words instead of 384 expanded bit bytes per block in
# both directions; bit expansion happens only where bytes are assembled.
# ---------------------------------------------------------------------------

def words32_to_bits(words32):
    """(..., nw) i32 -> (..., nw*32) u8 (packbits bit order per word)."""
    shifts = 31 - jnp.arange(32, dtype=_I32)
    bits = (words32[..., None] >> shifts) & 1
    return bits.reshape(words32.shape[:-1]
                        + (words32.shape[-1] * 32,)).astype(jnp.uint8)


def bits_to_words32(bits):
    """(..., nw*32) u8 -> (..., nw) i32."""
    nw = bits.shape[-1] // 32
    b = bits.reshape(bits.shape[:-1] + (nw, 32)).astype(_I32)
    weights = jax.lax.shift_left(_I32(1), 31 - jnp.arange(32, dtype=_I32))
    return jnp.sum(b * weights, axis=-1).astype(_I32)


_words32_to_bits = words32_to_bits        # internal aliases
_bits_to_words32 = bits_to_words32


def _witwords_to_bytes(witw):
    """(F, NB, WW) i32 -> (F, NB, WIT_BYTES) u8 big-endian per word."""
    shifts = jnp.asarray([24, 16, 8, 0], _I32)
    by = (witw[..., None] >> shifts) & 0xFF
    return by.reshape(witw.shape[:-1] + (WIT_BYTES,)).astype(jnp.uint8)


def _bytes_to_witwords(by):
    """(F, NB, WIT_BYTES) u8 -> (F, NB, WW) i32 big-endian per word."""
    b = by.reshape(by.shape[:-1] + (WW, 4)).astype(_I32)
    return ((b[..., 0] << 24) | (b[..., 1] << 16)
            | (b[..., 2] << 8) | b[..., 3]).astype(_I32)


@functools.partial(jax.jit,
                   static_argnames=("k_lanes", "vh", "nw", "interpret"))
def blocked_encode(bits, a, b, act, vals, m, floor_k, *, k_lanes: int,
                   vh: int, nw: int = NW, interpret: bool = None):
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

    Returns (words (F,NB,nw) i32 PACKED sub-filter words,
             wit (F,NB,128) u8, wcnt (F,NB) i32,
             vseg (F,NB,vh*32) i32, vcnt (F,NB) i32).
    """
    f_, nb, _ = bits.shape
    tg = _tile_blocks(nb)
    kern = functools.partial(_encode_kernel, k_lanes=k_lanes, nw=nw,
                             vh=vh)
    words32, aux, valc = pl.pallas_call(
        kern,
        grid=(f_, nb // tg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # m (F,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # floor_k (F,)
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tg, nw), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, AUXW), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, max(vh * 32, AUXW)),
                         lambda f, g: (f, g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f_, nb, nw), _I32),
            jax.ShapeDtypeStruct((f_, nb, AUXW), _I32),
            jax.ShapeDtypeStruct((f_, nb, max(vh * 32, AUXW)), _I32),
        ],
        interpret=_interpret() if interpret is None else interpret,
    )(m, floor_k, bits, a, b, act, vals.astype(_I32))
    return _encode_post(words32, aux, valc, vh)


def _encode_post(words32, aux, valc, vh):
    """Unpack the encode kernel's compact outputs: packed sub-filter
    words, witness bytes (aux lanes 0..WW-1), per-block pass/value
    counts (aux lanes WW and WW+1), value segments (stores are
    128-lane-aligned, so small vh buckets carry zero padding to slice
    off).  Words stay PACKED ((F,NB,nw) i32, packbits bit order per
    word — see words32_to_bits): the membership kernels consume exactly
    this form, and the host pulls 12 words instead of 384 expanded bit
    bytes per block."""
    wit = _witwords_to_bytes(aux[:, :, :WW])
    wcnt = aux[:, :, WW]
    vcnt = aux[:, :, WW + 1]
    vseg = valc[:, :, : vh * 32] if vh * 32 < AUXW else valc
    return words32, wit, wcnt, vseg, vcnt


def _i32(x):
    return jax.lax.bitcast_convert_type(x, _I32)


@functools.partial(jax.jit,
                   static_argnames=("k_lanes", "vh", "nw", "interpret"))
def blocked_encode_h(bits, h1, h2, act_hi, act_lo, vals, m, thi, tlo,
                     floor_k, *, k_lanes: int, vh: int, nw: int = NW,
                     interpret: bool = None):
    """blocked_encode with position/activation math fused in-kernel.

    Takes the per-geometry hash tables (h1/h2 (NB,IPB) i32 24-bit,
    act_hi/act_lo (NB,IPB) u32) plus per-frame scalars (m, thi, tlo,
    floor_k) instead of materialized (F,NB,IPB) a/b/act — ~375 MB less
    HBM traffic per 15x1080p chunk and one less program.  Output is
    identical to blocked_encode on _frame_mod_tables' tables."""
    f_, nb, _ = bits.shape
    tg = _tile_blocks(nb)
    kern = functools.partial(_encode_kernel_h, k_lanes=k_lanes, nw=nw,
                             vh=vh)
    table_spec = pl.BlockSpec((tg, IPB), lambda g, f: (g, 0))
    words32, aux, valc = pl.pallas_call(
        kern,
        grid=(nb // tg, f_),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # m (F,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # floor_k (F,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # thi (F,) i32 bits
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tlo (F,) i32 bits
            pl.BlockSpec((1, tg, IPB), lambda g, f: (f, g, 0)),  # bits
            table_spec, table_spec, table_spec, table_spec,
            pl.BlockSpec((1, tg, IPB), lambda g, f: (f, g, 0)),  # vals
        ],
        out_specs=[
            pl.BlockSpec((1, tg, nw), lambda g, f: (f, g, 0)),
            pl.BlockSpec((1, tg, AUXW), lambda g, f: (f, g, 0)),
            pl.BlockSpec((1, tg, max(vh * 32, AUXW)),
                         lambda g, f: (f, g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f_, nb, nw), _I32),
            jax.ShapeDtypeStruct((f_, nb, AUXW), _I32),
            jax.ShapeDtypeStruct((f_, nb, max(vh * 32, AUXW)), _I32),
        ],
        interpret=_interpret() if interpret is None else interpret,
    )(m, floor_k, _i32(thi), _i32(tlo), bits, h1, h2,
      _i32(act_hi), _i32(act_lo), vals.astype(_I32))
    return _encode_post(words32, aux, valc, vh)


@functools.partial(jax.jit,
                   static_argnames=("k_lanes", "nw", "interpret"))
def blocked_membership_h(words, h1, h2, act_hi, act_lo, m, thi, tlo,
                         floor_k, flags, *, k_lanes: int, nw: int = NW,
                         interpret: bool = None):
    """blocked_membership with in-kernel position/activation math (see
    blocked_encode_h).  words: (F,NB,>=nw) i32 PACKED sub-filter words
    (the form blocked_encode_h returns)."""
    _check_words(words, nw)
    f_, nb, _ = words.shape
    tg = _tile_blocks(nb)
    words = words[:, :, :nw]
    kern = functools.partial(_member_kernel_h, k_lanes=k_lanes, nw=nw)
    table_spec = pl.BlockSpec((tg, IPB), lambda f, g: (g, 0))
    passes = pl.pallas_call(
        kern,
        grid=(f_, nb // tg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # m
            pl.BlockSpec(memory_space=pltpu.SMEM),   # floor_k
            pl.BlockSpec(memory_space=pltpu.SMEM),   # thi
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tlo
            pl.BlockSpec(memory_space=pltpu.SMEM),   # flags
            pl.BlockSpec((1, tg, nw), lambda f, g: (f, g, 0)),
            table_spec, table_spec, table_spec, table_spec,
        ],
        out_specs=pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
        out_shape=jax.ShapeDtypeStruct((f_, nb, IPB), jnp.uint8),
        interpret=_interpret() if interpret is None else interpret,
    )(m, floor_k, _i32(thi), _i32(tlo), flags, words,
      h1, h2, _i32(act_hi), _i32(act_lo))
    wcnt = jnp.sum(passes.astype(_I32), axis=2)
    return passes, wcnt


@functools.partial(jax.jit,
                   static_argnames=("k_lanes", "nw", "interpret"))
def blocked_membership(words, a, b, act, m, floor_k, flags, *, k_lanes: int,
                       nw: int = NW, interpret: bool = None):
    """Membership pass for decode.

    words: (F, NB, >=nw) i32 PACKED sub-filter words (packbits bit
    order per word; see words32_to_bits / bits_to_words32 to convert);
    flags: (F,) i32 — 1 for pass-through/empty records (mask used
    verbatim; passes forced to 0).
    Returns (pass (F,NB,IPB) u8, wcnt (F,NB) i32)."""
    _check_words(words, nw)
    f_, nb, _ = words.shape
    tg = _tile_blocks(nb)
    words = words[:, :, :nw]
    kern = functools.partial(_member_kernel, k_lanes=k_lanes, nw=nw)
    passes = pl.pallas_call(
        kern,
        grid=(f_, nb // tg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tg, nw), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
        ],
        out_specs=pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
        out_shape=jax.ShapeDtypeStruct((f_, nb, IPB), jnp.uint8),
        interpret=_interpret() if interpret is None else interpret,
    )(m, floor_k, flags, words, a, b, act)
    wcnt = jnp.sum(passes.astype(_I32), axis=2)
    return passes, wcnt


@functools.partial(jax.jit, static_argnames=("vh", "interpret"))
def blocked_expand(passes, wit, raw_mask, flags, vseg, *, vh: int,
                   interpret: bool = None):
    """Witness + value expansion for decode.

    passes: (F,NB,IPB) u8 from blocked_membership; wit: (F,NB,128) u8
    per-block witness segments (host-sliced); raw_mask: (F,NB,IPB) u8
    unpacked mask bits for pass-through records; flags: (F,) i32;
    vseg: (F,NB,vh*32) i32 value segments.
    Returns (mask (F,NB,IPB) u8, vals (F,NB,IPB) i32)."""
    f_, nb, _ = passes.shape
    tg = _tile_blocks(nb)
    vpad = jnp.zeros((f_, nb, IPB), _I32)
    vpad = vpad.at[:, :, : vh * 32].set(vseg.astype(_I32))
    return pl.pallas_call(
        _expand_kernel,
        grid=(f_, nb // tg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, WW), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB), lambda f, g: (f, g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f_, nb, IPB), jnp.uint8),
            jax.ShapeDtypeStruct((f_, nb, IPB), _I32),
        ],
        interpret=_interpret() if interpret is None else interpret,
    )(flags, passes, _bytes_to_witwords(wit), raw_mask, vpad)


@functools.partial(jax.jit, static_argnames=("vh", "interpret"))
def blocked_expand_chain(passes, wit, raw_mask, flags, vseg, base_packed,
                         *, vh: int, interpret: bool = None):
    """Fused decode stage 2: witness/value expansion + frame chaining.

    Same record semantics as :func:`blocked_expand` followed by the
    chain scan, in ONE kernel pass (see :func:`_expand_chain_kernel`).

    passes: (F,NB,IPB) u8; wit: (F,NB,128) u8 witness segments;
    raw_mask: (F,NB,IPB) u8 for pass-through records; flags: (F,) i32;
    vseg: (F,NB,vh*32) i32 value segments; base_packed: (NB,IPB) i32 —
    24-bit packed pixels of the reconstruction base.
    Returns packed reconstructed frames (F, NB, IPB) i32.

    ``flags`` rides scalar prefetch so the raw-mask index map can route
    un-flagged frames to block row 0: with the frame axis innermost,
    consecutive same-index fetches are skipped, and the (F,NB,IPB) raw
    array costs HBM traffic only for frames that actually use it.
    """
    f_, nb, _ = passes.shape
    tg = _tile_blocks(nb)
    kern = functools.partial(_expand_chain_kernel, vh=vh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // tg, f_),
        in_specs=[
            pl.BlockSpec((1, tg, IPB), lambda g, f, flg: (f, g, 0)),
            pl.BlockSpec((1, tg, WW), lambda g, f, flg: (f, g, 0)),
            pl.BlockSpec((1, tg, IPB),
                         lambda g, f, flg: (flg[f] * f, g, 0)),   # raw
            pl.BlockSpec((1, tg, vh * 32), lambda g, f, flg: (f, g, 0)),
            pl.BlockSpec((tg, IPB), lambda g, f, flg: (g, 0)),   # base
        ],
        out_specs=pl.BlockSpec((1, tg, IPB), lambda g, f, flg: (f, g, 0)),
        scratch_shapes=[pltpu.VMEM((tg, IPB), _I32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_, nb, IPB), _I32),
        interpret=_interpret() if interpret is None else interpret,
    )(flags, passes, _bytes_to_witwords(wit), raw_mask,
      vseg.astype(_I32), base_packed)
