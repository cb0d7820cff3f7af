"""Interpret-mode tests for the blocked rational-Bloom Pallas kernels.

Validates the full device semantics against a loopy numpy oracle:
blocked insert (per-block sub-filters), membership, per-block
byte-aligned witness segments (np.packbits order), value compaction, and
the decode-side membership + expansion path."""

import numpy as np
import pytest

import jax.numpy as jnp

from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk


def make_case(F=2, NB=16, density=0.06, fk=2, m=100, seed=0):
    rng = np.random.default_rng(seed)
    n = NB * bk.IPB
    bits = (rng.random((F, NB, bk.IPB)) < density).astype(np.uint8)
    h1 = rng.integers(0, 1 << 24, (F, NB, bk.IPB)).astype(np.int64)
    h2 = rng.integers(0, 1 << 24, (F, NB, bk.IPB)).astype(np.int64)
    act = (rng.random((F, NB, bk.IPB)) < 0.4).astype(np.uint8)
    vals = rng.integers(0, 1 << 24, (F, NB, bk.IPB)).astype(np.uint32)
    a = (h1 % m).astype(np.int32)
    b = (h2 % m).astype(np.int32)
    ms = np.full(F, m, np.int32)
    fks = np.full(F, fk, np.int32)
    return bits, a, b, act, vals, ms, fks


def oracle(bits, a, b, act, m, fk):
    """Per-block oracle for one frame."""
    NB = bits.shape[0]
    words = np.zeros((NB, bk.MMAX), np.uint8)
    passes = np.zeros((NB, bk.IPB), bool)
    for blk in range(NB):
        for t in range(bk.IPB):
            if not bits[blk, t]:
                continue
            lanes = fk + (1 if act[blk, t] else 0)
            for j in range(lanes):
                words[blk, (a[blk, t] + j * b[blk, t]) % m] = 1
        for t in range(bk.IPB):
            lanes = fk + (1 if act[blk, t] else 0)
            ok = all(words[blk, (a[blk, t] + j * b[blk, t]) % m]
                     for j in range(lanes))
            passes[blk, t] = ok
    return words, passes


class TestEncodeKernel:
    def setup_method(self):
        self.case = make_case()
        bits, a, b, act, vals, ms, fks = self.case
        self.out = bk.blocked_encode(
            jnp.asarray(bits), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(act), jnp.asarray(vals), jnp.asarray(ms),
            jnp.asarray(fks), k_lanes=int(fks[0]), vh=4)
        self.out = [np.asarray(x) for x in self.out]

    def test_words_and_passes(self):
        bits, a, b, act, vals, ms, fks = self.case
        words, wit, wcnt, vseg, vcnt = self.out
        # encode emits PACKED words ((NB, nw) i32); expand for the oracle
        word_bits = np.asarray(bk.words32_to_bits(jnp.asarray(words)))
        for f in range(bits.shape[0]):
            ow, op = oracle(bits[f], a[f], b[f], act[f], int(ms[f]), int(fks[f]))
            np.testing.assert_array_equal(word_bits[f], ow)
            np.testing.assert_array_equal(wcnt[f], op.sum(axis=1))

    def test_witness_segments(self):
        bits, a, b, act, vals, ms, fks = self.case
        words, wit, wcnt, vseg, vcnt = self.out
        for f in range(bits.shape[0]):
            _, op = oracle(bits[f], a[f], b[f], act[f], int(ms[f]), int(fks[f]))
            for blk in range(bits.shape[1]):
                seg = np.packbits(bits[f, blk][op[blk]])
                np.testing.assert_array_equal(
                    wit[f, blk][: len(seg)], seg,
                    err_msg=f"frame {f} block {blk}")
                assert (wit[f, blk][len(seg):] == 0).all()

    def test_value_segments(self):
        bits, a, b, act, vals, ms, fks = self.case
        words, wit, wcnt, vseg, vcnt = self.out
        for f in range(bits.shape[0]):
            for blk in range(bits.shape[1]):
                sel = vals[f, blk][bits[f, blk].astype(bool)]
                assert vcnt[f, blk] == len(sel)
                np.testing.assert_array_equal(vseg[f, blk][: len(sel)], sel)


class TestDecodeKernels:
    def test_roundtrip(self):
        bits, a, b, act, vals, ms, fks = make_case(seed=3)
        ja, jb, jact = jnp.asarray(a), jnp.asarray(b), jnp.asarray(act)
        enc = bk.blocked_encode(
            jnp.asarray(bits), ja, jb, jact, jnp.asarray(vals),
            jnp.asarray(ms), jnp.asarray(fks), k_lanes=int(fks[0]), vh=4)
        words, wit, wcnt, vseg, vcnt = [np.asarray(x) for x in enc]

        flags = np.zeros(bits.shape[0], np.int32)
        passes, wcnt2 = bk.blocked_membership(
            jnp.asarray(words), ja, jb, jact, jnp.asarray(ms),
            jnp.asarray(fks), jnp.asarray(flags), k_lanes=int(fks[0]))
        np.testing.assert_array_equal(np.asarray(wcnt2), wcnt)

        raw = np.zeros_like(bits)
        mask, out_vals = bk.blocked_expand(
            passes, jnp.asarray(wit), jnp.asarray(raw), jnp.asarray(flags),
            jnp.asarray(vseg), vh=4)
        np.testing.assert_array_equal(np.asarray(mask), bits)
        want_vals = np.where(bits.astype(bool), vals, 0)
        np.testing.assert_array_equal(np.asarray(out_vals), want_vals)

    def test_passthrough_flag(self):
        bits, a, b, act, vals, ms, fks = make_case(F=1, seed=5)
        flags = np.ones(1, np.int32)
        words = np.zeros((1, bits.shape[1], bk.NW), np.int32)  # packed
        passes, wcnt = bk.blocked_membership(
            jnp.asarray(words), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(act), jnp.asarray(ms), jnp.asarray(fks),
            jnp.asarray(flags), k_lanes=int(fks[0]))
        assert (np.asarray(wcnt) == 0).all()
        # expansion takes the raw mask verbatim; values from segments
        vseg = np.zeros((1, bits.shape[1], 4 * 32), np.uint32)
        for blk in range(bits.shape[1]):
            sel = vals[0, blk][bits[0, blk].astype(bool)]
            vseg[0, blk, : len(sel)] = sel
        mask, out_vals = bk.blocked_expand(
            passes, jnp.zeros((1, bits.shape[1], 128), jnp.uint8),
            jnp.asarray(bits), jnp.asarray(flags), jnp.asarray(vseg), vh=4)
        np.testing.assert_array_equal(np.asarray(mask), bits)
        np.testing.assert_array_equal(
            np.asarray(out_vals), np.where(bits.astype(bool), vals, 0))


@pytest.mark.slow
class TestExpandChainFused:
    def test_matches_unfused_expand_plus_chain(self):
        """blocked_expand_chain == blocked_expand followed by the frame
        chain, including pass-through flags and empty frames."""
        bits, a, b, act, vals, ms, fks = make_case(F=4, NB=16, seed=11)
        F, NB = bits.shape[:2]
        ja, jb, jact = jnp.asarray(a), jnp.asarray(b), jnp.asarray(act)
        enc = bk.blocked_encode(
            jnp.asarray(bits), ja, jb, jact, jnp.asarray(vals),
            jnp.asarray(ms), jnp.asarray(fks), k_lanes=int(fks[0]), vh=4)
        words, wit, wcnt, vseg, vcnt = enc

        # frame 2 becomes a pass-through record (raw mask, empty witness)
        flags = np.array([0, 0, 1, 0], np.int32)
        raw = np.zeros_like(bits)
        raw[2] = bits[2]
        passes, _ = bk.blocked_membership(
            words, ja, jb, jact, jnp.asarray(ms), jnp.asarray(fks),
            jnp.asarray(flags), k_lanes=int(fks[0]))

        mask, out_vals = bk.blocked_expand(
            passes, wit, jnp.asarray(raw), jnp.asarray(flags), vseg, vh=4)

        # reference chain on host (24-bit packed domain)
        rng = np.random.default_rng(99)
        base = rng.integers(0, 1 << 24, (NB, bk.IPB)).astype(np.int32)
        run = base.copy()
        want = np.zeros((F, NB, bk.IPB), np.int32)
        mask_np, vals_np = np.asarray(mask), np.asarray(out_vals)
        for f in range(F):
            run = np.where(mask_np[f] > 0, vals_np[f], run)
            want[f] = run

        got = bk.blocked_expand_chain(
            passes, wit, jnp.asarray(raw), jnp.asarray(flags), vseg,
            jnp.asarray(base), vh=4)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_full_width_vseg(self):
        """vh*32 == IPB (no in-kernel pad) still round-trips."""
        bits, a, b, act, vals, ms, fks = make_case(F=2, NB=8, seed=13)
        ja, jb, jact = jnp.asarray(a), jnp.asarray(b), jnp.asarray(act)
        enc = bk.blocked_encode(
            jnp.asarray(bits), ja, jb, jact, jnp.asarray(vals),
            jnp.asarray(ms), jnp.asarray(fks), k_lanes=int(fks[0]),
            vh=bk.IPB // 32)
        words, wit, wcnt, vseg, vcnt = enc
        flags = np.zeros(2, np.int32)
        raw = np.zeros_like(bits)
        passes, _ = bk.blocked_membership(
            words, ja, jb, jact, jnp.asarray(ms), jnp.asarray(fks),
            jnp.asarray(flags), k_lanes=int(fks[0]))
        base = np.zeros((8, bk.IPB), np.int32)
        got = np.asarray(bk.blocked_expand_chain(
            passes, wit, jnp.asarray(raw), jnp.asarray(flags), vseg,
            jnp.asarray(base), vh=bk.IPB // 32))
        # chained reconstruction from zero base = last change wins
        want = np.zeros((2, 8, bk.IPB), np.int32)
        run = base.copy()
        for f in range(2):
            run = np.where(bits[f] > 0, vals[f].astype(np.int32), run)
            want[f] = run
        np.testing.assert_array_equal(got, want)


def test_excl_prefix_ladder():
    import jax
    rng = np.random.default_rng(0)
    x = rng.integers(0, 3, (bk.BG, bk.IPB)).astype(np.int32)
    got = np.asarray(jax.jit(bk.excl_prefix)(jnp.asarray(x)))
    want = np.cumsum(x, axis=1) - x
    np.testing.assert_array_equal(got, want)


def test_butterfly_roundtrip_properties():
    """Compaction then expansion is identity on kept lanes, across many
    random densities (the conflict-freeness property)."""
    import jax

    @jax.jit
    def compact(vals, kept):
        lane = np.arange(bk.IPB, dtype=np.int32)[None, :]
        cpos = bk.excl_prefix(kept.astype(jnp.int32))
        (out,), outk = bk.compact_butterfly(
            [vals], kept.astype(jnp.bool_), jnp.asarray(lane) - cpos)
        return out, outk

    @jax.jit
    def expand(seg, kept):
        (out,) = bk.expand_butterfly([seg], kept.astype(jnp.bool_))
        return out

    rng = np.random.default_rng(7)
    for density in (0.003, 0.05, 0.3, 0.7, 0.97):
        kept = (rng.random((bk.BG, bk.IPB)) < density).astype(np.int32)
        vals = rng.integers(0, 1 << 24, (bk.BG, bk.IPB)).astype(np.int32)
        out, outk = [np.asarray(x) for x in compact(
            jnp.asarray(vals), jnp.asarray(kept))]
        for r in range(bk.BG):
            want = vals[r][kept[r].astype(bool)]
            np.testing.assert_array_equal(out[r][: len(want)], want)
        # expansion inverts
        back = np.asarray(expand(jnp.asarray(out), jnp.asarray(kept)))
        for r in range(bk.BG):
            want = vals[r][kept[r].astype(bool)]
            np.testing.assert_array_equal(back[r][kept[r].astype(bool)], want)


@pytest.mark.slow
def test_hash_native_kernels_match_table_kernels():
    """blocked_encode_h / blocked_membership_h (in-kernel mod +
    activation compare) are bit-identical to the table-fed kernels on
    _frame_mod_tables' output."""
    import jax.numpy as jnp

    from new_bloom_filter_repo_tpu.models import blocked_pipeline as bp

    rng = np.random.default_rng(44)
    F, NB = 3, 16
    n = NB * bk.IPB
    tabs = bp.blocked_tables(n)
    assert tabs["nb"] == NB
    bits = (rng.random((F, NB, bk.IPB)) < 0.06).astype(np.uint8)
    vals = rng.integers(0, 1 << 24, (F, NB, bk.IPB)).astype(np.int32)
    m = jnp.asarray(np.array([100, 196, 320], np.int32))
    fk = jnp.asarray(np.array([1, 2, 3], np.int32))
    thi = jnp.asarray(np.array([0x20000000, 0x80000000, 0xF0000000],
                               np.uint32))
    tlo = jnp.asarray(np.array([123, 0, 0xFFFFFFFF], np.uint32))
    flags = jnp.asarray(np.array([0, 0, 1], np.int32))

    a, b, act = bp._frame_mod_tables(
        tabs["h1"], tabs["h2"], tabs["act_hi"], tabs["act_lo"],
        m, thi, tlo)
    bits_d, vals_d = jnp.asarray(bits), jnp.asarray(vals)
    want = bk.blocked_encode(bits_d, a, b, act, vals_d, m, fk,
                             k_lanes=3, vh=4)
    got = bk.blocked_encode_h(bits_d, tabs["h1"], tabs["h2"],
                              tabs["act_hi"], tabs["act_lo"], vals_d,
                              m, thi, tlo, fk, k_lanes=3, vh=4)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    words = want[0]
    want_m = bk.blocked_membership(words, a, b, act, m, fk, flags,
                                   k_lanes=3)
    got_m = bk.blocked_membership_h(words, tabs["h1"], tabs["h2"],
                                    tabs["act_hi"], tabs["act_lo"],
                                    m, thi, tlo, fk, flags, k_lanes=3)
    for g, w in zip(got_m, want_m):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.slow
def test_kernel_geometry_padding_stream_parity(monkeypatch):
    """nbk_of pads the kernel block axis for large frames; the emitted
    byte stream must be identical to an nb-exact run and decode
    lossless (models/blocked_pipeline.py nbk_of)."""
    from new_bloom_filter_repo_tpu.models import blocked_pipeline as bp

    h, w = 520, 1024                  # nb = 520 -> nbk = 576
    n = h * w
    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (h, w), dtype=np.uint8)
    frames = []
    cur = base
    # one frame per record type: blocked, sparse, empty, pass-through
    for kind in ("blocked", "sparse", "empty", "pass"):
        nxt = cur.copy()
        if kind == "blocked":
            ys = rng.integers(0, h, 4000)
            xs = rng.integers(0, w, 4000)
            nxt[ys, xs] = rng.integers(0, 255, 4000, dtype=np.uint8)
        elif kind == "sparse":
            nxt[3, 5] ^= 0xFF
            nxt[100, 200] ^= 0x0F
        elif kind == "pass":     # p >= P_STAR but below keyframe density
            flat = nxt.reshape(-1)
            idx = rng.choice(n, size=int(n * 0.40), replace=False)
            flat[idx] = rng.integers(1, 255, idx.size, dtype=np.uint8)
        frames.append(nxt)
        cur = nxt

    def decode_all(payloads):
        """Mirror models/video.py's routing: device runs go through
        decode_run, DPCM residual records (which the encoder may now
        prefer for dense-change frames) apply on host against the
        running reconstruction."""
        import new_bloom_filter_repo_tpu.models.frame_codec as fc
        out, run = [], []
        prev = base

        def flush():
            nonlocal prev
            if run:
                decoded = bp.BlockedDecoder().decode_run(prev, list(run))
                out.extend(decoded)
                prev = decoded[-1]
                run.clear()

        for p in payloads:
            t = p[0]
            off = 0
            tsh = tlog_w = None
            if t in (fc.MOTION, fc.MOTION_HP):
                dy, dx, off = fc.parse_motion(p)
            elif t == fc.TILES:
                tlog_w, tsh, off = fc.parse_motion_tiles(p)
            if p[off] in fc.RESIDUAL_TYPES:
                flush()
                res = fc.parse_residual_any(p, off, prev.shape)
                if t == fc.TILES:
                    frame = fc.apply_residual(
                        fc.tile_predict(prev, tsh, tlog_w), res)
                elif t in (fc.MOTION, fc.MOTION_HP):
                    frame = fc.apply_residual(prev, res, dy, dx,
                                              halfpel=t == fc.MOTION_HP)
                else:
                    frame = fc.apply_residual(prev, res)
                out.append(frame)
                prev = frame
            else:
                run.append(p)
        flush()
        return out

    def run():
        bp.blocked_tables.cache_clear()
        enc = bp.BlockedEncoder()
        payloads: list = []
        enc.encode_chunk(base, frames, payloads,
                         keyframe_fn=lambda j: b"")
        out = decode_all(payloads)
        return payloads, out

    tab = bp.blocked_tables(h * w)
    assert tab["nbk"] > tab["nb"]     # padding is actually exercised
    pay_pad, out_pad = run()

    monkeypatch.setattr(bp, "nbk_of", lambda nb: nb)
    pay_exact, out_exact = run()
    bp.blocked_tables.cache_clear()

    assert pay_pad == pay_exact
    for a, b_, c in zip(out_pad, out_exact, frames):
        np.testing.assert_array_equal(a, b_)
        np.testing.assert_array_equal(a, c)
