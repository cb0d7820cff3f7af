"""Round-3 features: global-motion records (type 6), entropy-coded
blocked records (type 7), and the num_threads/batch_size plumbing.

Reference context: the reference's diff is strictly co-located
(improved_video_compressor.py:801 — no motion handling of any kind) and
its layout zlibs only the value stream (improved_video_compressor.py:956);
types 6/7 are this framework's extensions (models/frame_codec.py).
"""

import os
import tempfile
from collections import Counter

import numpy as np
import pytest

from new_bloom_filter_repo_tpu.models import blocked_pipeline as bp
from new_bloom_filter_repo_tpu.models import frame_codec as fc
from new_bloom_filter_repo_tpu.models.video import (
    ImprovedVideoCompressor,
    verify_lossless,
)
from new_bloom_filter_repo_tpu.utils import container


def _pan_frames(count=18, h=96, w=128, seed=3):
    """Textured scene panning by (1, 3) px/frame via np.roll + sparse
    sensor noise — the content class the motion search targets."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 240, (h, w), dtype=np.uint8)
    # smooth the texture so zlib has structure to find
    base = (base[:, :] // 3 + np.arange(w, dtype=np.uint8)[None, :] // 2)
    frames = []
    scene = base.astype(np.uint8)
    for i in range(count):
        scene = np.roll(np.roll(scene, 1, axis=0), 3, axis=1)
        f = scene.copy()
        spots = rng.random(f.shape) < 0.01
        f[spots] = rng.integers(0, 255, int(spots.sum()))
        frames.append(f)
    return frames


@pytest.fixture(scope="module")
def pan_streams(tmp_path_factory):
    """Encode the pan clip with and without motion; return
    (frames, results, payload lists)."""
    frames = _pan_frames()
    out = {}
    td = tmp_path_factory.mktemp("pan")
    for motion in (False, True):
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=30,
                                       motion=motion)
        path = str(td / f"pan_{motion}.bfvc")
        res = comp.compress_video(frames, path, input_color_space="BGR")
        _, payloads = container.read_bfvc(path)
        dec = comp.decompress_video(path)
        out[motion] = (res, payloads, dec)
    return frames, out


class TestMotion:
    def test_pan_lossless_and_smaller(self, pan_streams):
        frames, out = pan_streams
        for motion in (False, True):
            res, _, dec = out[motion]
            v = verify_lossless(frames, dec)
            assert v["lossless"], f"motion={motion} not lossless"
        # the motion encode must collapse the pan (VERDICT r2 #2)
        assert (out[True][0]["compression_ratio"]
                < 0.5 * out[False][0]["compression_ratio"])

    def test_motion_emits_type6_records(self, pan_streams):
        _, out = pan_streams
        types_on = Counter(fc.record_type(p) for p in out[True][1])
        types_off = Counter(fc.record_type(p) for p in out[False][1])
        assert types_on[fc.MOTION] > 10
        assert fc.MOTION not in types_off

    def test_motion_header_roundtrip(self):
        inner = b"\x02"  # EMPTY record
        rec = fc.wrap_motion(-3, 7, inner)
        assert fc.record_type(rec) == fc.MOTION
        dy, dx, off = fc.parse_motion(rec)
        assert (dy, dx) == (-3, 7)
        assert rec[off:] == inner

    def test_motion_env_kill_switch(self, monkeypatch):
        monkeypatch.setenv("NBF_MOTION", "0")
        enc = bp.BlockedEncoder(motion=True)
        assert not enc.motion

    def test_choose_shifts_policy(self):
        side = 2 * bp.MOTION_RADIUS + 1
        zero = bp.MOTION_RADIUS * side + bp.MOTION_RADIUS
        counts = np.full((3, side * side), 1000, np.int64)
        # frame 0: candidate (2, -1) clearly wins
        win = (bp.MOTION_RADIUS + 2) * side + (bp.MOTION_RADIUS - 1)
        counts[0, win] = 100
        # frame 1: best barely beats zero — margin gate keeps (0, 0)
        counts[1, zero] = 500
        counts[1, win] = 450
        # frame 2: tiny zero count — not worth shifting
        counts[2, :] = 10
        counts[2, win] = 0
        shifts = bp.choose_shifts(counts)
        assert shifts[0].tolist() == [2, -1]
        assert shifts[1].tolist() == [0, 0]
        assert shifts[2].tolist() == [0, 0]

    def test_static_content_stream_identical_with_motion_enabled(self):
        """Zero shifts must reproduce the motion-off byte stream."""
        rng = np.random.default_rng(5)
        base = rng.integers(0, 255, (64, 96, 3), np.uint8)
        frames = []
        for t in range(10):
            f = base.copy()
            f[10:20, 10 + t:20 + t] = t * 11
            frames.append(f)
        streams = []
        for motion in (False, True):
            comp = ImprovedVideoCompressor(verbose=False, motion=motion)
            with tempfile.TemporaryDirectory() as td:
                p = os.path.join(td, "s.bfvc")
                comp.compress_video(frames, p, input_color_space="BGR")
                streams.append(open(p, "rb").read())
        assert streams[0] == streams[1]


class TestBlockedZ:
    def test_type7_records_emitted_and_decode(self, pan_streams):
        frames, out = pan_streams
        inner_types = Counter()
        for p in out[True][1]:
            t = fc.record_type(p)
            if t == fc.MOTION:
                _, _, off = fc.parse_motion(p)
                t = p[off]
            inner_types[t] += 1
        # type 12 (sectioned values) supersedes type 7 when a non-
        # DEFLATE value coding stores smaller; either proves the
        # entropy-coded blocked layout is live on this content.
        assert inner_types[fc.BLOCKED_Z] + inner_types[fc.BLOCKED_S] > 0

    def test_type7_and_type3_decode_identically(self, pan_streams,
                                                 tmp_path, monkeypatch):
        """Rewrite every type-7 record as raw type-3 (the pre-entropy
        layout) and check both streams reconstruct the same frames —
        the cross-version decode guarantee (VERDICT r2 #3).  Encoded
        with NBF_WITNESS_PACK=0: a coding-7 (bit-packed) witness has
        no raw type-3 representation (the per-block byte boundaries
        only exist decode-side), so the rewrite scenario pins the
        byte-padded codings."""
        frames, out = pan_streams
        monkeypatch.setenv("NBF_WITNESS_PACK", "0")
        comp0 = ImprovedVideoCompressor(verbose=False,
                                        keyframe_interval=30)
        p0 = str(tmp_path / "padded.bfvc")
        comp0.compress_video(frames, p0)
        _, payloads = container.read_bfvc(p0)
        legacy = []
        for p in payloads:
            prefix = b""
            t = fc.record_type(p)
            off = 0
            if t == fc.MOTION:
                dy, dx, off = fc.parse_motion(p)
                prefix = p[:off]
                t = p[off]
            if t not in (fc.BLOCKED_Z, fc.BLOCKED_S):
                legacy.append(p)
                continue
            rec = (fc.parse_blocked_z(p, off + 1) if t == fc.BLOCKED_Z
                   else fc.parse_blocked_s(p, off + 1))
            rebuilt = fc.build_interframe_record(
                rec["p"], rec["n"], rec["k"],
                rec["bitmap_bytes"].tobytes(), rec["bitmap_bits"],
                rec["witness_bytes"].tobytes(), rec["witness_bits"],
                rec["values"],
                rtype=fc.BLOCKED if rec["witness_bits"] else fc.INTERFRAME)
            legacy.append(prefix + rebuilt)
        p3 = str(tmp_path / "legacy.bfvc")
        container.write_bfvc(p3, legacy, container.MAGIC_BLOOM)
        comp = ImprovedVideoCompressor(verbose=False)
        dec = comp.decompress_video(p3)
        v = verify_lossless(frames, dec)
        assert v["lossless"]

    def test_section_parse_rejects_unknown_coding(self):
        rec = fc.build_blocked_z_record(
            0.1, 1024, 3.0, 1024, 0, (0, b"\x00" * 128, 0), (0, b"", 0),
            b"x", 1)
        bad = bytearray(rec)
        bad[21] = 9  # bitmap section coding byte (1 type + 5*4 header)
        with pytest.raises(ValueError):
            fc.parse_blocked_z(bytes(bad), 1)


class TestPlumbing:
    def test_num_threads_reaches_native_deflate(self, monkeypatch):
        from new_bloom_filter_repo_tpu.utils import native
        seen = {}
        real = native.deflate_frames

        def spy(buffers, level=6, threads=0, engine="zlib"):
            seen["threads"] = threads
            return real(buffers, level=level, threads=threads,
                        engine=engine)

        monkeypatch.setattr(native, "deflate_frames", spy)
        monkeypatch.setattr(bp.native, "deflate_frames", spy)
        frames = _pan_frames(count=6, h=64, w=64)
        comp = ImprovedVideoCompressor(verbose=False, num_threads=3)
        comp.compress_video(frames, None, input_color_space="BGR")
        assert seen.get("threads") == 3

    def test_batch_size_is_the_device_chunk(self):
        comp = ImprovedVideoCompressor(verbose=False, batch_size=7)
        assert comp.batch_size == 7 and comp._chunk == 7
        with pytest.raises(ValueError):
            ImprovedVideoCompressor(batch_size=0)

    def test_cross_batch_size_decode(self, tmp_path):
        frames = _pan_frames(count=12, h=64, w=64)
        p = str(tmp_path / "c.bfvc")
        ImprovedVideoCompressor(verbose=False, batch_size=5).compress_video(
            frames, p, input_color_space="BGR")
        dec = ImprovedVideoCompressor(
            verbose=False, batch_size=9).decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]


class TestGuards:
    def test_membership_rejects_expanded_u8_words(self):
        import jax.numpy as jnp
        from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk
        u8 = jnp.zeros((1, 8, bk.MMAX), jnp.uint8)
        with pytest.raises(TypeError):
            bk.blocked_membership(
                u8, jnp.zeros((1, 8, bk.IPB), jnp.int32),
                jnp.zeros((1, 8, bk.IPB), jnp.int32),
                jnp.zeros((1, 8, bk.IPB), jnp.uint8),
                jnp.ones(1, jnp.int32), jnp.ones(1, jnp.int32),
                jnp.zeros(1, jnp.int32), k_lanes=2)

    def test_decoder_rejects_small_m(self, tmp_path):
        """A third-party stream with m < MIN_M must fail loudly, not
        decode wrong (_fast_mod's precondition; ADVICE r2)."""
        h = w = 64
        frames = _pan_frames(count=3, h=h, w=w)
        key = fc.encode_keyframe(frames[0], None, typed=True)
        n = h * w
        tab = bp.blocked_tables(n)
        nb = tab["nb"]
        m = 8  # < MIN_M
        bitmap = b"\x00" * ((m * nb + 7) // 8)
        bad = fc.build_interframe_record(
            0.01, n, 3.0, bitmap, m * nb, b"\x01", 5,
            np.zeros(4, np.uint8), rtype=fc.BLOCKED)
        p = str(tmp_path / "bad.bfvc")
        container.write_bfvc(p, [key, bad], container.MAGIC_BLOOM)
        with pytest.raises(ValueError, match="sub-filter width"):
            ImprovedVideoCompressor(verbose=False).decompress_video(p)

    def test_verify_lossless_shape_mismatch_reports_inf(self):
        a = [np.zeros((4, 4), np.uint8)]
        b = [np.zeros((4, 5), np.uint8)]
        v = verify_lossless(a, b)
        assert not v["lossless"]
        assert v["max_difference"] == float("inf")

    def test_verify_lossless_wide_dtype_report_exact(self):
        # float64 diff report must not round through float32
        a = [np.array([[1e9 + 1]], np.float64)]
        b = [np.array([[1e9]], np.float64)]
        v = verify_lossless(a, b)
        assert v["max_difference"] == 1.0


class TestResidualRecords:
    """Type-8 DPCM records: dense-change content that previously fell
    back to raw keyframes (film grain, subpixel pans) now stores a
    DEFLATE'd (curr - prev) mod 256 residual, optionally against a
    motion-rolled prev."""

    def _grain_frames(self, count=10, h=64, w=96):
        from new_bloom_filter_repo_tpu.utils.synthetic import (
            generate_frames)
        return [np.asarray(f) for f in generate_frames(
            count, w, h, noise=0.0, grain=3.0, color_space="GRAY")]

    def test_grain_clip_uses_residuals_and_beats_keyframes(self, tmp_path):
        frames = self._grain_frames()
        p = str(tmp_path / "g.bfvc")
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=30)
        res = comp.compress_video(frames, p, input_color_space="BGR")
        dec = comp.decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]
        _, payloads = container.read_bfvc(p)
        types = Counter()
        for x in payloads:
            t = fc.record_type(x)
            if t == fc.MOTION:
                _, _, off = fc.parse_motion(x)
                t = x[off]
            elif t == fc.AVG2:
                _, _, off = fc.parse_motion_avg2(x)
                t = x[off]
            types[t] += 1
        # any residual flavor counts: plain DEFLATE (8), byte-rANS
        # section (13), or spatially-filtered section (14) — whether
        # bare, motion-wrapped, or avg2-wrapped (type 19)
        n_res = sum(types[t] for t in fc.RESIDUAL_TYPES)
        assert n_res >= 5, dict(types)
        key = ImprovedVideoCompressor(verbose=False, mode="keyframe")
        rk = key.compress_video(frames, str(tmp_path / "k.bfvc"))
        assert res["compressed_size"] < 0.6 * rk["compressed_size"]

    def test_residual_record_roundtrip_unit(self):
        rng = np.random.default_rng(0)
        prev = rng.integers(0, 255, (16, 24), np.uint8)
        curr = (prev + rng.integers(-4, 5, prev.shape)).astype(np.uint8)
        import zlib
        residual = (curr - np.roll(np.roll(prev, 1, 0), 2, 1)).tobytes()
        rec = fc.build_residual_record(len(residual),
                                       zlib.compress(residual, 6))
        back = fc.parse_residual_record(rec, 1)
        got = fc.apply_residual(prev, back, 1, 2)
        np.testing.assert_array_equal(got, curr)

    def test_truncated_residual_raises(self, tmp_path):
        frames = self._grain_frames(count=4)
        key = fc.encode_keyframe(frames[0], None, typed=True)
        bad = fc.build_residual_record(10, b"notzlib")
        p = str(tmp_path / "bad.bfvc")
        container.write_bfvc(p, [key, bad], container.MAGIC_BLOOM)
        with pytest.raises(Exception):
            ImprovedVideoCompressor(verbose=False).decompress_video(p)

    def test_uint16_grain_clip_residual_byte_domain(self, tmp_path):
        """HDR-ish uint16 content with full-frame change inter-codes
        through byte-domain residuals bit-exactly."""
        rng = np.random.default_rng(3)
        base = rng.integers(0, 60000, (48, 64), np.uint16)
        frames = []
        cur = base
        for t in range(6):
            cur = (cur + rng.integers(-300, 300, cur.shape)).astype(
                np.uint16)
            frames.append(cur)
        p = str(tmp_path / "u16.bfvc")
        comp = ImprovedVideoCompressor(verbose=False)
        comp.compress_video(frames, p, input_color_space="BGR")
        dec = comp.decompress_video(p)
        v = verify_lossless(frames, dec)
        assert v["lossless"]


def test_motion_wrapping_non_inter_type_raises(tmp_path):
    """A corrupt motion record whose inner type byte is not an
    inter/residual type must raise, not spin on an empty decode run
    (confirmed hang before the guard)."""
    frames = _pan_frames(count=3, h=64, w=64)
    key = fc.encode_keyframe(frames[0], None, typed=True)
    bad = fc.wrap_motion(1, 2, key)  # inner KEYFRAME: invalid wrap
    p = str(tmp_path / "badmotion.bfvc")
    container.write_bfvc(p, [key, bad], container.MAGIC_BLOOM)
    with pytest.raises(ValueError, match="invalid inner type"):
        ImprovedVideoCompressor(verbose=False).decompress_video(p)


class TestHalfPel:
    def test_halfpel_predict_matches_manual_bilinear(self):
        rng = np.random.default_rng(2)
        prev = rng.integers(0, 255, (8, 10), np.uint8)
        # sy=1, sx=0: average of roll(0) and roll(1) rows
        got = fc.halfpel_predict(prev, 1, 0)
        want = ((prev.astype(np.uint16) + np.roll(prev, 1, 0)) + 1) >> 1
        np.testing.assert_array_equal(got, want.astype(np.uint8))
        # even shifts reduce to np.roll
        np.testing.assert_array_equal(
            fc.halfpel_predict(prev, 4, -2), np.roll(np.roll(prev, 2, 0),
                                                     -1, 1))
        # negative odd: sample between roll(-2) and roll(-1)
        got = fc.halfpel_predict(prev, -3, 0)
        want = ((np.roll(prev, -2, 0).astype(np.uint16)
                 + np.roll(prev, -1, 0)) + 1) >> 1
        np.testing.assert_array_equal(got, want.astype(np.uint8))

    def test_subpixel_pan_uses_type9_and_shrinks(self, tmp_path):
        from new_bloom_filter_repo_tpu.utils.synthetic import (
            generate_frames)
        frames = [np.asarray(f) for f in generate_frames(
            12, 128, 96, noise=1.0, noise_frac=0.01, pan=2.5,
            pan_mode="subpixel", color_space="GRAY")]
        p = str(tmp_path / "sp.bfvc")
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=30)
        res = comp.compress_video(frames, p, input_color_space="BGR")
        dec = comp.decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]
        _, payloads = container.read_bfvc(p)
        types = Counter(fc.record_type(x) for x in payloads)
        assert types[fc.MOTION_HP] >= 3, dict(types)
        # the half-pel prediction must clearly beat keyframe coding
        key = ImprovedVideoCompressor(verbose=False, mode="keyframe")
        rk = key.compress_video(frames, str(tmp_path / "k.bfvc"))
        assert res["compressed_size"] < 0.8 * rk["compressed_size"]

    def test_halfpel_on_non_uint8_raises(self):
        with pytest.raises(ValueError):
            fc.apply_residual(np.zeros((4, 4), np.uint16),
                              np.zeros(32, np.uint8), 1, 0, halfpel=True)


def _zoom_frames(count=10, h=96, w=128):
    """Nearest-neighbor zoom-in over a smooth texture: radial motion no
    single global shift fits — the type-10 per-tile target content."""
    yy, xx = np.mgrid[0:h, 0:w]
    tex = ((np.sin(yy / 5.0) * 40 + np.cos(xx / 7.0) * 40
            + np.sin((yy + xx) / 11.0) * 30 + 128)).clip(0, 255).astype(
                np.uint8)
    frames = []
    for t in range(count):
        s = 1.0 + 0.02 * t
        cy, cx = h / 2, w / 2
        sy = np.clip(((yy - cy) / s + cy).astype(int), 0, h - 1)
        sx = np.clip(((xx - cx) / s + cx).astype(int), 0, w - 1)
        g = tex[sy, sx]
        frames.append(np.stack([g, g // 2 + 30, g // 3 + 60],
                               -1).astype(np.uint8))
    return frames


class TestTileMotion:
    def test_tile_predict_matches_naive(self):
        rng = np.random.default_rng(5)
        prev = rng.integers(0, 255, (70, 90, 3), np.uint8)
        tlog = 5
        ty, tx = -(-70 // 32), -(-90 // 32)
        tsh = rng.integers(-7, 8, (ty, tx, 2)).astype(np.int8)
        pred = fc.tile_predict(prev, tsh, tlog)
        ref = np.empty_like(prev)
        for y in range(70):
            for x in range(90):
                dy, dx = tsh[y // 32, x // 32]
                ref[y, x] = prev[np.clip(y - dy, 0, 69),
                                 np.clip(x - dx, 0, 89)]
        assert np.array_equal(pred, ref)

    def test_tile_wrap_parse_roundtrip(self):
        rng = np.random.default_rng(6)
        # compressible map (mostly equal shifts) exercises the zlib'd
        # branch; a random map exercises the raw branch
        for mode in ("smooth", "random"):
            if mode == "smooth":
                tsh = np.full((9, 12, 2), 3, np.int8)
            else:
                tsh = rng.integers(-7, 8, (9, 12, 2)).astype(np.int8)
            rec = fc.wrap_motion_tiles(5, tsh, b"INNER")
            assert rec[0] == fc.TILES
            tlog, ts2, off = fc.parse_motion_tiles(rec)
            assert tlog == 5
            assert np.array_equal(ts2, tsh)
            assert rec[off:] == b"INNER"

    def test_zoom_clip_uses_type10_and_shrinks(self, tmp_path):
        frames = _zoom_frames()
        sizes = {}
        for motion in (False, True):
            comp = ImprovedVideoCompressor(verbose=False, motion=motion)
            path = str(tmp_path / f"z_{motion}.bfvc")
            comp.compress_video(frames, path, input_color_space="BGR")
            _, payloads = container.read_bfvc(path)
            dec = comp.decompress_video(path)
            v = verify_lossless(frames, dec)
            assert v["lossless"], f"motion={motion} not lossless"
            sizes[motion] = sum(len(p) for p in payloads)
            if motion:
                types = Counter(p[0] for p in payloads)
                # radial motion wins through a motion-model record:
                # the per-tile map (10/17) or the parametric zoom (18)
                assert (types[fc.TILES] + types[fc.TILES_HP]
                        + types[fc.ZOOM_G]) > 0, types
        assert sizes[True] < sizes[False]

    def test_tile_geometry_mismatch_raises(self):
        prev = np.zeros((64, 64), np.uint8)
        tsh = np.zeros((5, 5, 2), np.int8)  # wrong grid for 64x64/32
        with pytest.raises(ValueError, match="tile map"):
            fc.tile_predict(prev, tsh, 5)

    def test_choose_tile_shifts_policy(self):
        side = 2 * bp.MOTION_RADIUS + 1
        zero_idx = bp.MOTION_RADIUS * side + bp.MOTION_RADIUS
        summary = np.zeros((2, 2, 3), np.int64)
        # tile (0,0): clear win at shift (1, 2)
        cand = (1 + bp.MOTION_RADIUS) * side + (2 + bp.MOTION_RADIUS)
        summary[0, 0] = (cand, 2, 50)
        # tile (0,1): below TILE_MIN_C0 -> stays zero
        summary[0, 1] = (cand, 0, bp.TILE_MIN_C0 - 1)
        # tile (1,0): margin not cleared -> stays zero
        summary[1, 0] = (cand, 45, 50)
        # tile (1,1): zero-shift already best
        summary[1, 1] = (zero_idx, 10, 10)
        t = bp.choose_tile_shifts(summary)
        assert tuple(t[0, 0]) == (1, 2)
        assert not t[0, 1].any() and not t[1, 0].any() and not t[1, 1].any()


class TestFilteredKeyframes:
    def test_spatial_filter_inverts(self):
        rng = np.random.default_rng(7)
        for shape in ((33, 47), (33, 47, 3), (1, 1), (1, 9, 2), (9, 1)):
            a = rng.integers(0, 255, shape, np.uint8)
            for fid in (1, 2, 3):
                f = fc.spatial_filter(a, fid)
                assert np.array_equal(fc.spatial_unfilter(f, fid), a)

    def test_med_fallback_matches_native(self):
        """The numpy raster fallback of the MED unfilter must agree
        with native nbf_unfilter_med byte-for-byte."""
        from new_bloom_filter_repo_tpu.utils import native as nm
        rng = np.random.default_rng(11)
        for shape in ((13, 21), (8, 8, 3)):
            a = rng.integers(0, 256, shape, np.uint8)
            f = fc.spatial_filter(a, 3)
            got_native = nm.unfilter_med(f)
            saved = nm._has_unfilter_med
            nm._has_unfilter_med = False
            try:
                got_py = nm.unfilter_med(f)
            finally:
                nm._has_unfilter_med = saved
            assert np.array_equal(got_native, a)
            assert np.array_equal(got_py, a)

    def test_med_beats_sub_up_on_gradient_edges(self):
        """MED's edge adaptivity: on a ramp with a flat patch (both
        horizontal and vertical structure) it must DEFLATE smaller
        than either one-axis filter, and encode_keyframe_best must
        pick it."""
        import zlib
        y, x = np.mgrid[0:96, 0:128]
        img = ((y * 2 + x) % 256).astype(np.uint8)
        img[30:60, 40:80] = 200
        frame = np.stack([img, img // 2, 255 - img], -1)
        sizes = {fid: len(zlib.compress(
            fc.spatial_filter(frame, fid).tobytes(), 9))
            for fid in (1, 2, 3)}
        assert sizes[3] < sizes[1] and sizes[3] < sizes[2], sizes
        best = fc.encode_keyframe_best(frame, None)
        assert best[0] in (fc.FILTERED, fc.KEYFRAME_S)
        assert best[1] == 3
        out, info = (fc.decode_keyframe(best, offset=2, filter_id=3)
                     if best[0] == fc.FILTERED
                     else fc.decode_keyframe_s(best, 1))
        assert np.array_equal(out, frame)

    def test_filtered_smaller_on_smooth_and_roundtrips(self):
        y, x = np.mgrid[0:80, 0:100]
        img = ((np.sin(y / 13.0) * 60 + np.cos(x / 17.0) * 60
                + 128)).clip(0, 255).astype(np.uint8)
        frame = np.stack([img, img // 2 + 30, img // 3 + 80], -1)
        plain = fc.encode_keyframe(frame, None, typed=True)
        best = fc.encode_keyframe_best(frame, None)
        assert best[0] == fc.FILTERED
        assert len(best) < len(plain)
        out, info = fc.decode_keyframe(best, offset=2, filter_id=best[1])
        assert np.array_equal(out, frame) and info is None

    def test_flag3_planes_filter_roundtrip(self):
        y, x = np.mgrid[0:64, 0:64]
        img = ((y * 2 + x) % 256).astype(np.uint8)
        up, vp = img[::2, ::2], (img // 2)[::2, ::2]
        f444 = np.stack([img,
                         np.repeat(np.repeat(up, 2, 0), 2, 1),
                         np.repeat(np.repeat(vp, 2, 0), 2, 1)], -1)
        info = {"format": "I420", "y_plane": img, "u_plane": up,
                "v_plane": vp}
        best = fc.encode_keyframe_best(f444, info)
        fid = best[1] if best[0] == fc.FILTERED else 0
        out, i2 = fc.decode_keyframe(best, offset=2 if fid else 1,
                                     filter_id=fid)
        assert np.array_equal(out, f444)
        assert np.array_equal(i2["u_plane"], up)
        assert np.array_equal(i2["v_plane"], vp)

    def test_noise_falls_back_to_unfiltered_keyframe(self):
        """Incompressible noise must not pick a spatial filter; since
        type 15 it stores as a sectioned keyframe whose section is RAW
        (coding 0) — smaller than DEFLATE-wrapping incompressible
        bytes — with filter_id 0."""
        rng = np.random.default_rng(8)
        noise = rng.integers(0, 256, (64, 64, 3), np.uint8)
        best = fc.encode_keyframe_best(noise, None)
        assert best[0] in (fc.KEYFRAME, fc.KEYFRAME_S)
        if best[0] == fc.KEYFRAME_S:
            assert best[1] == 0  # no spatial filter on pure noise
            out, info = fc.decode_keyframe_s(best, 1)
            assert np.array_equal(out, noise) and info is None
            plain = fc.encode_keyframe(noise, None, typed=True)
            assert len(best) < len(plain)

    def test_scene_cut_clip_emits_type11_and_lossless(self, tmp_path):
        rng = np.random.default_rng(9)
        y, x = np.mgrid[0:64, 0:80]
        frames = []
        for t in range(9):
            scene = t // 3
            base = ((np.sin(y / 7.0 + scene) * 50
                     + np.cos(x / 9.0 + 2 * scene) * 50
                     + 128)).clip(0, 255).astype(np.uint8)
            f = np.stack([base, base // 2 + 40, base // 3 + 90], -1)
            frames.append(f.astype(np.uint8))
        comp = ImprovedVideoCompressor(verbose=False)
        path = str(tmp_path / "sc.bfvc")
        comp.compress_video(frames, path, input_color_space="BGR")
        _, payloads = container.read_bfvc(path)
        types = Counter(p[0] for p in payloads)
        assert types[fc.FILTERED] > 0, types
        dec = comp.decompress_video(path)
        assert verify_lossless(frames, dec)["lossless"]

    def test_bad_filter_id_raises(self, tmp_path):
        y, x = np.mgrid[0:32, 0:32]
        img = ((y + x) % 256).astype(np.uint8)
        rec = fc.encode_keyframe(img, None, typed=True, zlib_level=6,
                                 filter_id=1)
        bad = bytes([rec[0], 7]) + rec[2:]
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "bad.bfvc")
        container.write_bfvc(p, [bad], container.MAGIC_BLOOM)
        with pytest.raises(ValueError, match="filter id"):
            comp.decompress_video(p)

    def test_filter_on_non_uint8_rejected(self):
        with pytest.raises(ValueError, match="uint8"):
            fc.encode_keyframe(np.zeros((8, 8), np.uint16), typed=True,
                               filter_id=1)


class TestByteRans:
    """Section coding 3: order-0 byte-histogram rANS (native/nbf.cpp
    nbf_rans8_*, Python mirror in utils/native.py) and the sectioned
    record types that carry it — type 12 (blocked, coded value
    section) and type 13 (residual, coded section)."""

    def _lap_bytes(self, n=60000, seed=0):
        rng = np.random.default_rng(seed)
        return (rng.laplace(0, 3, n).astype(np.int64)
                % 256).astype(np.uint8).tobytes()

    def test_rans8_roundtrip_and_beats_deflate_on_grain(self):
        import zlib
        from new_bloom_filter_repo_tpu.utils import native
        data = self._lap_bytes()
        enc = native.rans8_encode(data)
        assert enc is not None
        assert native.rans8_decode(enc, len(data)) == data
        # Laplacian residuals: Huffman's integer bit lengths round up
        assert len(enc) < len(zlib.compress(data, 6))

    def test_rans8_native_python_bit_parity(self):
        from new_bloom_filter_repo_tpu.utils import native
        if native.load() is None or not native._has_rans8:
            pytest.skip("native rans8 unavailable")
        for seed, n in ((0, 50000), (1, 4096), (2, 9999)):
            data = self._lap_bytes(n, seed)
            enc_c = native.rans8_encode(data)
            saved = native._has_rans8
            native._has_rans8 = False
            try:
                enc_py = native.rans8_encode(data)
                assert enc_c == enc_py
                assert native.rans8_decode(enc_c, len(data)) == data
            finally:
                native._has_rans8 = saved

    def test_rans8_incompressible_returns_none(self):
        from new_bloom_filter_repo_tpu.utils import native
        rng = np.random.default_rng(4)
        data = rng.integers(0, 256, 50000, np.uint8).tobytes()
        assert native.rans8_encode(data) is None
        saved = native._has_rans8
        native._has_rans8 = False
        try:
            assert native.rans8_encode(data) is None
        finally:
            native._has_rans8 = saved

    def test_rans8_malformed_raises_both_paths(self):
        from new_bloom_filter_repo_tpu.utils import native
        data = self._lap_bytes(20000)
        enc = bytearray(native.rans8_encode(data))
        enc[0] ^= 0xFF  # corrupt the frequency table
        for native_path in (True, False):
            if native_path and (native.load() is None
                                or not native._has_rans8):
                continue
            saved = native._has_rans8
            native._has_rans8 = native_path
            try:
                with pytest.raises(ValueError):
                    native.rans8_decode(bytes(enc), len(data))
                with pytest.raises(ValueError):
                    native.rans8_decode(b"\x01\x02", 10)  # truncated
            finally:
                native._has_rans8 = saved

    def test_blocked_s_record_unit_roundtrip(self):
        from new_bloom_filter_repo_tpu.utils import native
        vals = self._lap_bytes(8192, 3)
        enc = native.rans8_encode(vals)
        rec = fc.build_blocked_s_record(
            0.1, 4096, 3.0, 4096, 64,
            (0, b"\x55" * 512, 0), (0, b"\xff" * 8, 0),
            (3, enc, len(vals)))
        assert rec[0] == fc.BLOCKED_S
        out = fc.parse_blocked_s(rec, 1)
        assert out["n"] == 4096 and out["witness_bits"] == 64
        assert out["values"].tobytes() == vals
        assert out["bitmap_bytes"].tobytes() == b"\x55" * 512

    def test_residual_s_record_unit_roundtrip(self):
        from new_bloom_filter_repo_tpu.utils import native
        raw = self._lap_bytes(8192, 5)
        enc = native.rans8_encode(raw)
        rec = fc.build_residual_s_record((3, enc, len(raw)))
        assert rec[0] == fc.RESIDUAL_S
        got = fc.parse_residual_any(rec, 0)
        assert got.tobytes() == raw
        # type 8 parses through the same dispatcher
        import zlib
        rec8 = fc.build_residual_record(len(raw), zlib.compress(raw, 1))
        assert fc.parse_residual_any(rec8, 0).tobytes() == raw
        with pytest.raises(ValueError, match="not a residual"):
            fc.parse_residual_any(b"\x02", 0)

    def test_grain_clip_emits_type13_and_lossless(self, tmp_path):
        rng = np.random.default_rng(7)
        base = rng.integers(0, 256, (72, 96, 3), np.uint8)
        frames = [base]
        for t in range(9):
            f = (frames[-1].astype(np.int16)
                 + rng.integers(-6, 7, (72, 96, 3)))
            frames.append(np.clip(f, 0, 255).astype(np.uint8))
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "g13.bfvc")
        comp.compress_video(frames, p)
        _, payloads = container.read_bfvc(p)
        types = Counter(x[0] for x in payloads)
        assert types[fc.RESIDUAL_S] >= 5, dict(types)
        dec = comp.decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]

    def test_sparse_uniform_values_emit_type12_and_lossless(self, tmp_path):
        rng = np.random.default_rng(8)
        frames = [np.zeros((72, 96), np.uint8)]
        for t in range(9):
            f = frames[-1].copy()
            idx = rng.random((72, 96)) < 0.05
            f[idx] = rng.integers(0, 256, int(idx.sum()))
            frames.append(f)
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "s12.bfvc")
        comp.compress_video(frames, p, input_color_space="BGR")
        _, payloads = container.read_bfvc(p)
        types = Counter(x[0] for x in payloads)
        assert types[fc.BLOCKED_S] >= 5, dict(types)
        dec = comp.decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]

    def test_type12_and_type7_decode_identically(self, tmp_path,
                                                  monkeypatch):
        """Rewrite every type-12 record with its value section as
        mandatory DEFLATE (type 7) and check both streams reconstruct
        the same frames — the cross-version decode guarantee (encoded
        with NBF_WITNESS_PACK=0: a bit-packed witness has no raw
        representation)."""
        import zlib
        monkeypatch.setenv("NBF_WITNESS_PACK", "0")
        rng = np.random.default_rng(8)
        frames = [np.zeros((72, 96), np.uint8)]
        for t in range(9):
            f = frames[-1].copy()
            idx = rng.random((72, 96)) < 0.05
            f[idx] = rng.integers(0, 256, int(idx.sum()))
            frames.append(f)
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "orig.bfvc")
        comp.compress_video(frames, p, input_color_space="BGR")
        _, payloads = container.read_bfvc(p)
        legacy = []
        for x in payloads:
            if x[0] != fc.BLOCKED_S:
                legacy.append(x)
                continue
            rec = fc.parse_blocked_s(x, 1)
            vals = rec["values"].tobytes()
            legacy.append(fc.build_blocked_z_record(
                rec["p"], rec["n"], rec["k"], rec["bitmap_bits"],
                rec["witness_bits"],
                (0, rec["bitmap_bytes"].tobytes(), 0),
                (0, rec["witness_bytes"].tobytes(), 0),
                zlib.compress(vals, 6), len(vals)))
        p7 = str(tmp_path / "legacy.bfvc")
        container.write_bfvc(p7, legacy, container.MAGIC_BLOOM)
        dec = ImprovedVideoCompressor(verbose=False).decompress_video(p7)
        assert verify_lossless(frames, dec)["lossless"]


class TestFilteredResiduals:
    """Type-14 records: the DPCM residual plane is SUB/UP-filtered
    (spatial_filter) before the coded section — fractional-motion
    prediction error keeps spatial correlation the temporal diff can't
    remove."""

    def test_record_unit_roundtrip(self):
        import zlib
        rng = np.random.default_rng(0)
        prev = rng.integers(0, 255, (16, 24), np.uint8)
        curr = (prev + rng.integers(-4, 5, prev.shape)).astype(np.uint8)
        res = (curr.astype(np.int16) - prev.astype(np.int16)).astype(
            np.uint8)
        for fid in (1, 2, 3):
            fb = fc.spatial_filter(res, fid).tobytes()
            rec = fc.build_residual_f_record(
                fid, (1, zlib.compress(fb, 1), len(fb)))
            assert rec[0] == fc.RESIDUAL_F and rec[1] == fid
            back = fc.parse_residual_any(rec, 0, prev.shape)
            got = fc.apply_residual(prev, back)
            np.testing.assert_array_equal(got, curr)

    def test_bad_filter_id_and_missing_shape_raise(self):
        import zlib
        rec = bytearray(fc.build_residual_f_record(
            1, (1, zlib.compress(b"\x00" * 64, 1), 64)))
        with pytest.raises(ValueError, match="filter id"):
            fc.build_residual_f_record(5, (0, b"", 0))
        rec[1] = 7
        with pytest.raises(ValueError, match="filter id"):
            fc.parse_residual_any(bytes(rec), 0, (8, 8))
        rec[1] = 1
        with pytest.raises(ValueError, match="shape"):
            fc.parse_residual_any(bytes(rec), 0)
        with pytest.raises(ValueError, match="length mismatch"):
            fc.parse_residual_any(bytes(rec), 0, (9, 9))

    def test_subpixel_pan_emits_type14_and_shrinks(self, tmp_path):
        from new_bloom_filter_repo_tpu.utils.synthetic import (
            generate_frames)
        frames = [np.asarray(f) for f in generate_frames(
            12, 176, 144, noise=1.0, noise_frac=0.01, pan=2.5,
            pan_mode="subpixel", color_space="GRAY")]
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "sp14.bfvc")
        res = comp.compress_video(frames, p, input_color_space="BGR")
        _, payloads = container.read_bfvc(p)
        inner = Counter()
        for x in payloads:
            t = x[0]
            if t in (fc.MOTION, fc.MOTION_HP):
                _, _, off = fc.parse_motion(x)
                inner[x[off]] += 1
        assert inner[fc.RESIDUAL_F] >= 3, dict(inner)
        dec = comp.decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]


class TestContextRans:
    """Section coding 4: order-1 context rANS (native/nbf.cpp
    nbf_ransc_*) — the previous byte's magnitude bucket selects one of
    8 conditional histograms, winning on heteroscedastic grain and
    prediction-error streams."""

    def _hetero_bytes(self, n_seg=50, seg=2000, seed=0):
        rng = np.random.default_rng(seed)
        segs = []
        for i in range(n_seg):
            sigma = 1.0 if i % 2 == 0 else 12.0
            segs.append((rng.laplace(0, sigma, seg).astype(np.int64)
                         % 256).astype(np.uint8))
        return np.concatenate(segs).tobytes()

    def test_ransc_roundtrip_and_beats_order0(self):
        from new_bloom_filter_repo_tpu.utils import native
        data = self._hetero_bytes()
        enc = native.ransc_encode(data)
        assert enc is not None
        assert native.ransc_decode(enc, len(data)) == data
        r8 = native.rans8_encode(data)
        assert len(enc) < len(r8)

    def test_ransc_native_python_bit_parity(self):
        from new_bloom_filter_repo_tpu.utils import native
        if native.load() is None or not native._has_ransc:
            pytest.skip("native ransc unavailable")
        for seed in (0, 1):
            data = self._hetero_bytes(seed=seed)
            enc_c = native.ransc_encode(data)
            saved = native._has_ransc
            native._has_ransc = False
            try:
                assert native.ransc_encode(data) == enc_c
                assert native.ransc_decode(enc_c, len(data)) == data
            finally:
                native._has_ransc = saved

    def test_ransc_malformed_raises_both_paths(self):
        from new_bloom_filter_repo_tpu.utils import native
        data = self._hetero_bytes(n_seg=10)
        enc = bytearray(native.ransc_encode(data))
        enc[0] ^= 0xFF  # corrupt table 0
        for native_path in (True, False):
            if native_path and (native.load() is None
                                or not native._has_ransc):
                continue
            saved = native._has_ransc
            native._has_ransc = native_path
            try:
                with pytest.raises(ValueError):
                    native.ransc_decode(bytes(enc), len(data))
                with pytest.raises(ValueError):
                    native.ransc_decode(b"\x00" * 10, 5)
            finally:
                native._has_ransc = saved

    def test_coding4_section_in_residual_record(self):
        from new_bloom_filter_repo_tpu.utils import native
        raw = self._hetero_bytes(n_seg=10)
        enc = native.ransc_encode(raw)
        rec = fc.build_residual_s_record((4, enc, len(raw)))
        got = fc.parse_residual_any(rec, 0)
        assert got.tobytes() == raw

    def test_subpixel_pan_cif_picks_rans_coding(self, tmp_path):
        """At CIF scale the filtered subpixel-pan residuals choose a
        byte-rANS coder over DEFLATE and the stream stays bit-exact.
        (Before the MED filter this content picked the order-1 coder
        (4); MED prediction whitens the residual's spatial correlation
        so the cheaper order-0 coder (3) now reaches the same entropy
        — either way the rANS family must win here.)"""
        from new_bloom_filter_repo_tpu.utils.synthetic import (
            generate_frames)
        frames = [np.asarray(f) for f in generate_frames(
            8, 352, 288, noise=1.0, noise_frac=0.01, pan=2.5,
            pan_mode="subpixel", color_space="GRAY")]
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "c4.bfvc")
        comp.compress_video(frames, p, input_color_space="BGR")
        _, payloads = container.read_bfvc(p)
        codings = Counter()
        for x in payloads:
            t = x[0]
            off = 0
            if t in (fc.MOTION, fc.MOTION_HP):
                _, _, off = fc.parse_motion(x)
                t = x[off]
            if t == fc.RESIDUAL_F:
                codings[x[off + 2]] += 1
            elif t == fc.RESIDUAL_S:
                codings[x[off + 1]] += 1
        assert codings[3] + codings[4] >= 1, dict(codings)
        dec = comp.decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]


class TestSectionedKeyframes:
    """Type-15 records: typed-keyframe streams as coded sections so
    byte/context rANS can beat DEFLATE on grain-dominated keyframes."""

    def _grain_img(self, h=96, w=128, seed=0):
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:h, 0:w]
        return ((np.sin(y / 9.0) * 50 + np.cos(x / 11.0) * 50 + 128)
                + rng.laplace(0, 4, (h, w))).clip(0, 255).astype(np.uint8)

    def test_best_picks_type15_on_grain_and_roundtrips(self):
        img = self._grain_img()
        best = fc.encode_keyframe_best(img, None)
        plain = fc.encode_keyframe(img, None, typed=True)
        assert best[0] == fc.KEYFRAME_S
        assert len(best) < len(plain)
        out, info = fc.decode_keyframe_s(best, 1)
        assert np.array_equal(out, img) and info is None

    def test_all_flags_and_filters_roundtrip(self):
        img = self._grain_img()
        imgc = np.stack([img, img // 2 + 10, img // 3 + 40], -1)
        for fid in (0, 1, 2):
            rec = fc.encode_keyframe_s(img, None, filter_id=fid)
            out, info = fc.decode_keyframe_s(rec, 1)
            assert np.array_equal(out, img) and info is None
        # flag 2: planes are the channels
        info2 = {"format": "YUV444", "y_plane": imgc[:, :, 0],
                 "u_plane": imgc[:, :, 1], "v_plane": imgc[:, :, 2]}
        rec = fc.encode_keyframe_s(imgc, info2, filter_id=0)
        out, i3 = fc.decode_keyframe_s(rec, 1)
        assert np.array_equal(out, imgc)
        assert np.array_equal(i3["u_plane"], imgc[:, :, 1])
        # flag 3: frame derivable from native planes
        up, vp = img[::2, ::2], (img // 2)[::2, ::2]
        f444 = np.stack([img,
                         np.repeat(np.repeat(up, 2, 0), 2, 1),
                         np.repeat(np.repeat(vp, 2, 0), 2, 1)], -1)
        i420 = {"format": "I420", "y_plane": img, "u_plane": up,
                "v_plane": vp}
        rec = fc.encode_keyframe_s(f444, i420, filter_id=1)
        out, i4 = fc.decode_keyframe_s(rec, 1)
        assert np.array_equal(out, f444)
        assert np.array_equal(i4["u_plane"], up)

    def test_non_uint8_returns_none(self):
        assert fc.encode_keyframe_s(np.zeros((8, 8), np.uint16)) is None

    def test_malformed_raises(self):
        img = self._grain_img(48, 64)
        rec = bytearray(fc.encode_keyframe_s(img, None, filter_id=1))
        rec[1] = 7
        with pytest.raises(ValueError, match="filter id"):
            fc.decode_keyframe_s(bytes(rec), 1)
        rec[1] = 1
        rec[2] = 9
        with pytest.raises(ValueError, match="plane flag"):
            fc.decode_keyframe_s(bytes(rec), 1)

    def test_grain_clip_emits_type15_and_lossless(self, tmp_path):
        """Scene cuts between grain-heavy scenes force keyframe
        fallback; the sectioned variant must win there and the stream
        stays bit-exact."""
        rng = np.random.default_rng(3)
        frames = []
        for t in range(8):
            scene = t // 2
            y, x = np.mgrid[0:96, 0:128]
            base = ((np.sin(y / 9.0 + scene * 2) * 50
                     + np.cos(x / 11.0 + scene) * 50 + 128)
                    + rng.laplace(0, 4, (96, 128)))
            frames.append(base.clip(0, 255).astype(np.uint8))
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "k15.bfvc")
        comp.compress_video(frames, p, input_color_space="BGR")
        _, payloads = container.read_bfvc(p)
        types = Counter(x[0] for x in payloads)
        assert types[fc.KEYFRAME_S] >= 1, dict(types)
        dec = comp.decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]


class TestMultiReference:
    """Type-16 multi-reference half-pel residuals: sub-half-pel motion
    (slow pans, chroma planes at half the luma rate) is invisible to
    the half-pel grid frame-to-frame; a 2- or 4-frame baseline lands
    back on it (frame_codec.wrap_motion_ref)."""

    def _qpel_frames(self, n=14, h=96, w=128, seed=0):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, 256, (h + 8, w + 8), np.uint8).astype(
            np.float64)
        frames = []
        for i in range(n):
            sh = 0.25 * i
            i0, ph = int(sh), 0.25 * i - int(sh)
            a = src[2:2 + h, 2 + i0:2 + i0 + w]
            b = src[2:2 + h, 3 + i0:3 + i0 + w]
            plane = np.round(a * (1 - ph) + b * ph).astype(np.uint8)
            frames.append(np.stack([plane] * 3, axis=-1))
        return frames

    def test_quarter_pel_pan_emits_ref_records_and_roundtrips(
            self, tmp_path):
        frames = self._qpel_frames()
        comp = ImprovedVideoCompressor(verbose=False,
                                       keyframe_interval=30)
        p = str(tmp_path / "qpel.bfvc")
        res = comp.compress_video(frames, p)
        _, payloads = container.read_bfvc(p)
        types = Counter(x[0] for x in payloads)
        assert types[fc.REF_HP] >= 3, dict(types)
        dec = comp.decompress_video(p)
        assert verify_lossless(frames, dec)["lossless"]
        # multi-ref prediction must beat what keyframes would cost
        assert res["compression_ratio"] < 0.6

    def test_corrupt_ref_depth_raises(self, tmp_path):
        frames = self._qpel_frames()
        comp = ImprovedVideoCompressor(verbose=False,
                                       keyframe_interval=30)
        p = str(tmp_path / "qpel.bfvc")
        comp.compress_video(frames, p)
        _, payloads = container.read_bfvc(p)
        idx = next(i for i, x in enumerate(payloads)
                   if x[0] == fc.REF_HP)
        bad = bytearray(payloads[idx])
        bad[1] = 99  # ref_back outside [2, 7]
        payloads[idx] = bytes(bad)
        p2 = str(tmp_path / "bad.bfvc")
        container.write_bfvc(p2, payloads, container.MAGIC_BLOOM)
        with pytest.raises(ValueError):
            comp.decompress_video(p2)

    def test_ref_depth_beyond_history_raises(self, tmp_path):
        frames = self._qpel_frames()
        comp = ImprovedVideoCompressor(verbose=False,
                                       keyframe_interval=30)
        p = str(tmp_path / "qpel.bfvc")
        comp.compress_video(frames, p)
        _, payloads = container.read_bfvc(p)
        idx = next(i for i, x in enumerate(payloads)
                   if x[0] == fc.REF_HP)
        # a type-16 record right after the keyframe has 1 frame of
        # history; any ref_back >= 2 must fail loudly
        moved = [payloads[0], payloads[idx]]
        p3 = str(tmp_path / "early.bfvc")
        container.write_bfvc(p3, moved, container.MAGIC_BLOOM)
        with pytest.raises(ValueError, match="history"):
            comp.decompress_video(p3)


class TestParametricZoom:
    """Type-18 two-scale parametric zoom (GMC): wrap/parse, the
    latent-grid prediction identity, and the end-to-end tracker on a
    cumulatively-resampled zoom clip."""

    def test_wrap_parse_roundtrip(self):
        rec = fc.wrap_motion_zoom(8000, -2, 3, b"INNER", ref_back=5,
                                  z_ref=4000)
        assert rec[0] == fc.ZOOM_G
        rb, zc, zr, dy, dx, off = fc.parse_motion_zoom(rec)
        assert (rb, zc, zr, dy, dx) == (5, 8000, 4000, -2, 3)
        assert rec[off:] == b"INNER"

    def test_parse_rejects_bad_fields(self):
        with pytest.raises(ValueError, match="ref_back"):
            fc.parse_motion_zoom(fc.wrap_motion_zoom(1, 0, 0, b"X")[:1]
                                 + b"\x00" + b"\x00" * 12)
        bad = bytearray(fc.wrap_motion_zoom(1, 0, 0, b"X", ref_back=2))
        bad[2:6] = (600_000).to_bytes(4, "little", signed=True)
        with pytest.raises(ValueError, match="out of range"):
            fc.parse_motion_zoom(bytes(bad))
        with pytest.raises(ValueError, match="truncated"):
            fc.parse_motion_zoom(b"\x12\x01\x00")
        with pytest.raises(ValueError, match="ref_back"):
            fc.wrap_motion_zoom(0, 0, 0, b"X", ref_back=16)

    def test_single_scale_matches_direct_map(self):
        """z_ref=0 must reproduce the single-stage floor map exactly."""
        rng = np.random.default_rng(7)
        prev = rng.integers(0, 255, (64, 96), np.uint8)
        for zp in (4000, -4000, 120_000):
            got = fc.zoom_predict(prev, zp)
            s = 1.0 + zp * 1e-6
            cy, cx = 32.0, 48.0
            ys = np.clip(np.floor((np.arange(64) - cy) / s + cy)
                         .astype(np.int64), 0, 63)
            xs = np.clip(np.floor((np.arange(96) - cx) / s + cx)
                         .astype(np.int64), 0, 95)
            assert np.array_equal(got, prev[np.ix_(ys, xs)])

    def test_two_scale_exact_on_resampled_zoom(self):
        """Latent-grid identity: frames built as NN zooms of one base
        are predicted EXACTLY from any reference frame when the record
        carries both cumulative scales (a single relative scale
        composes two quantizations and mispredicts most pixels)."""
        rng = np.random.default_rng(8)
        base = rng.integers(0, 255, (128, 160), np.uint8)
        h, w = base.shape

        def nn_zoom(img, s):
            ys = np.clip(((np.arange(h) - h / 2) / s + h / 2)
                         .astype(np.int64), 0, h - 1)
            xs = np.clip(((np.arange(w) - w / 2) / s + w / 2)
                         .astype(np.int64), 0, w - 1)
            return img[np.ix_(ys, xs)]

        z = 4000  # 0.4%/frame
        ref = nn_zoom(base, 1.0 + z * 6 * 1e-6)    # frame 6
        curr = nn_zoom(base, 1.0 + z * 9 * 1e-6)   # frame 9
        pred2 = fc.zoom_predict(ref, z * 9, z * 6)
        assert np.array_equal(pred2, curr)
        # the single-scale relative map is NOT exact on the same pair
        rel = int(round((1 + z * 9e-6) / (1 + z * 6e-6) * 1e6 - 1e6))
        pred1 = fc.zoom_predict(ref, rel)
        assert not np.array_equal(pred1, curr)

    def test_zoom_clip_emits_type18_and_shrinks(self, tmp_path):
        """End-to-end: a steady resampled zoom with sparse noise and a
        moving object keeps the tracker locked across chunk boundaries
        and codes most frames as type-18 records."""
        rng = np.random.default_rng(9)
        small = rng.integers(20, 200, (16, 20, 3)).astype(np.int16)
        base = np.clip(np.repeat(np.repeat(small, 8, 0), 8, 1)
                       + rng.integers(-5, 6, (128, 160, 3)), 0,
                       255).astype(np.uint8)
        h, w = 128, 160

        def nn_zoom(img, s):
            ys = np.clip(((np.arange(h) - h / 2) / s + h / 2)
                         .astype(np.int64), 0, h - 1)
            xs = np.clip(((np.arange(w) - w / 2) / s + w / 2)
                         .astype(np.int64), 0, w - 1)
            return img[np.ix_(ys, xs)]

        frames = []
        for i in range(20):
            fr = nn_zoom(base, 1.0 + 0.012 * i).copy()
            m = rng.random((h, w)) < 0.02
            fr[m] = np.clip(fr[m].astype(np.int16)
                            + rng.integers(-4, 5, (int(m.sum()), 3)),
                            0, 255).astype(np.uint8)
            x = (6 + 5 * i) % (w - 30)
            fr[40:60, x:x + 24] = (210, 40, 90)
            frames.append(fr)
        sizes = {}
        for motion in (False, True):
            comp = ImprovedVideoCompressor(verbose=False, motion=motion)
            path = str(tmp_path / f"zg_{motion}.bfvc")
            comp.compress_video(frames, path, input_color_space="BGR")
            _, payloads = container.read_bfvc(path)
            dec = comp.decompress_video(path)
            v = verify_lossless(frames, dec)
            assert v["lossless"], f"motion={motion} not lossless"
            sizes[motion] = sum(len(p) for p in payloads)
            if motion:
                types = Counter(p[0] for p in payloads)
                assert types[fc.ZOOM_G] >= 10, types
                # the tracker must survive the 15-frame chunk boundary
                zg_after = [i for i, p in enumerate(payloads)
                            if p[0] == fc.ZOOM_G and i > 15]
                assert zg_after, types
        assert sizes[True] < 0.75 * sizes[False]


class TestAvg2:
    """Type-19 conditional two-reference average: static scenes under
    per-frame grain — the averaged prediction halves the reference-side
    noise where the references agree; the threshold keeps moving
    content on plain DPCM (frame_codec.wrap_avg2/avg2_predict)."""

    def test_wrap_parse_roundtrip_and_ranges(self):
        rec = fc.wrap_avg2(2, 16, b"INNER")
        rb2, thr, off = fc.parse_motion_avg2(rec)
        assert (rb2, thr, rec[off:]) == (2, 16, b"INNER")
        with pytest.raises(ValueError):
            fc.wrap_avg2(1, 16, b"X")     # rb2 below range
        with pytest.raises(ValueError):
            fc.wrap_avg2(2, 0, b"X")      # zero threshold
        with pytest.raises(ValueError):
            fc.parse_motion_avg2(bytes([fc.AVG2, 99, 16]))
        with pytest.raises(ValueError):
            fc.parse_motion_avg2(bytes([fc.AVG2, 2, 0]))

    def test_predict_conditional_exact(self):
        a = np.array([[10, 200, 128]], np.uint8)
        b = np.array([[12, 100, 129]], np.uint8)
        out = fc.avg2_predict(a, b, 8)
        # |10-12|=2 <= 8 -> round mean 11; |200-100| > 8 -> ref1;
        # |128-129| <= 8 -> (257+1)>>1 = 129
        assert out.tolist() == [[11, 200, 129]]

    def _grain_frames(self, n=12, h=288, w=352, sigma=3.0, seed=7):
        from new_bloom_filter_repo_tpu.utils.synthetic import (
            generate_frames)
        return generate_frames(n, w, h, seed=seed, grain=sigma,
                               noise=0.0)

    def test_grain_clip_emits_avg2_and_shrinks(self, tmp_path):
        frames = self._grain_frames()
        sizes = {}
        for motion in (False, True):
            comp = ImprovedVideoCompressor(verbose=False, motion=motion,
                                           keyframe_interval=len(frames))
            p = str(tmp_path / f"g_{motion}.bfvc")
            comp.compress_video(frames, p)
            _, payloads = container.read_bfvc(p)
            dec = comp.decompress_video(p)
            assert verify_lossless(frames, dec)["lossless"]
            sizes[motion] = sum(len(x) for x in payloads)
            if motion:
                types = Counter(x[0] for x in payloads)
                assert types[fc.AVG2] >= 6, dict(types)
        # conditional averaging must beat plain DPCM on grain content.
        # The margin is modest by design: the 2D-context rANS already
        # exploits the grain's spatial correlation, so halving the
        # reference-side noise moves coded size far less than SAD
        # (~10% SAD -> ~0.5-1% bytes); the trial only has to win.
        assert sizes[True] < sizes[False], sizes

    def test_avg2_depth_beyond_history_raises(self, tmp_path):
        frames = self._grain_frames(n=8, h=96, w=128, sigma=4.0)
        comp = ImprovedVideoCompressor(verbose=False,
                                       keyframe_interval=30)
        # synthesize: keyframe + an avg2 record immediately after it
        # (1 frame of history; rb2 >= 2 must fail loudly)
        p = str(tmp_path / "g.bfvc")
        comp.compress_video(self._grain_frames(), p)
        _, payloads = container.read_bfvc(p)
        idx = next(i for i, x in enumerate(payloads)
                   if x[0] == fc.AVG2)
        moved = [payloads[0], payloads[idx]]
        p2 = str(tmp_path / "early.bfvc")
        container.write_bfvc(p2, moved, container.MAGIC_BLOOM)
        with pytest.raises(ValueError, match="history"):
            comp.decompress_video(p2)

    def test_analyze_stream_names_avg2(self, tmp_path):
        from new_bloom_filter_repo_tpu.utils.streaminfo import (
            attribute_stream)
        frames = self._grain_frames()
        comp = ImprovedVideoCompressor(verbose=False,
                                       keyframe_interval=len(frames))
        p = str(tmp_path / "g.bfvc")
        comp.compress_video(frames, p)
        _, payloads = container.read_bfvc(p)
        info = attribute_stream(payloads)
        assert "motion-avg2" in info["records"]
        assert "residual" in info.get("wrapped_inner_types", {}) or \
            "residual-sectioned" in info.get("wrapped_inner_types", {}) \
            or "residual-filtered" in info.get("wrapped_inner_types", {})


class TestParametricRotation:
    """Type-20 two-angle parametric rotation (GMC): wrap/parse, the
    latent-grid predictor, anchored tracking on rotating clips, range
    guards (frame_codec.wrap_motion_rot/rot_predict)."""

    def test_wrap_parse_roundtrip_and_ranges(self):
        rec = fc.wrap_motion_rot(25000, -3, 7, b"INNER", ref_back=4,
                                 a_ref=12000)
        rb, ac, ar, dy, dx, off = fc.parse_motion_rot(rec)
        assert (rb, ac, ar, dy, dx, rec[off:]) == (
            4, 25000, 12000, -3, 7, b"INNER")
        with pytest.raises(ValueError):
            fc.wrap_motion_rot(2_000_000, 0, 0, b"X")   # angle range
        with pytest.raises(ValueError):
            fc.wrap_motion_rot(0, 0, 0, b"X", ref_back=0)
        with pytest.raises(ValueError):
            fc.parse_motion_rot(bytes([fc.ROT_G, 99]) + b"\0" * 12)
        bad = bytearray(fc.wrap_motion_rot(1000, 0, 0, b"X"))
        bad[2:6] = (2_000_000).to_bytes(4, "little", signed=True)
        with pytest.raises(ValueError):
            fc.parse_motion_rot(bytes(bad))

    def test_predict_single_stage_exact_on_generated_rotation(self):
        """With a_ref=0 the predictor IS the generation map: predicting
        a rotated frame from its latent base must be exact."""
        rng = np.random.default_rng(5)
        base = rng.integers(0, 256, (64, 96), np.uint8)
        pred = fc.rot_predict(base, 50000)
        # reference implementation of the same map
        import math as m
        th = 50000 * 1e-6
        c, s = m.cos(th), m.sin(th)
        cy, cx = 32.0, 48.0
        yy = np.arange(64, dtype=np.float64)[:, None] - cy
        xx = np.arange(96, dtype=np.float64)[None, :] - cx
        ry = np.clip(np.floor(cy + yy * c - xx * s).astype(np.int64),
                     0, 63)
        rx = np.clip(np.floor(cx + yy * s + xx * c).astype(np.int64),
                     0, 95)
        assert np.array_equal(pred, base[ry, rx])

    def _rot_clip(self, n=10, h=288, w=352, rate=8000, seed=2):
        from new_bloom_filter_repo_tpu.utils.synthetic import (
            _smooth_texture)
        import math as m
        rng = np.random.default_rng(seed)
        base = _smooth_texture(rng, h, w, False)
        cy, cx = h / 2.0, w / 2.0
        yy = np.arange(h, dtype=np.float64)[:, None] - cy
        xx = np.arange(w, dtype=np.float64)[None, :] - cx

        def rot(urad):
            th = urad * 1e-6
            c, s = m.cos(th), m.sin(th)
            ry = np.clip(np.floor(cy + yy * c - xx * s).astype(
                np.int64), 0, h - 1)
            rx = np.clip(np.floor(cx + yy * s + xx * c).astype(
                np.int64), 0, w - 1)
            return base[ry, rx]

        return [rot(rate * i) for i in range(n)]

    def test_rotating_clip_emits_type20_and_shrinks(self, tmp_path):
        frames = self._rot_clip()
        sizes = {}
        for motion in (False, True):
            comp = ImprovedVideoCompressor(verbose=False, motion=motion,
                                           keyframe_interval=len(frames))
            p = str(tmp_path / f"r_{motion}.bfvc")
            comp.compress_video(frames, p)
            _, payloads = container.read_bfvc(p)
            dec = comp.decompress_video(p)
            assert verify_lossless(frames, dec)["lossless"]
            sizes[motion] = sum(len(x) for x in payloads)
            if motion:
                types = Counter(x[0] for x in payloads)
                assert types[fc.ROT_G] >= 5, dict(types)
        # the anchored parametric prediction must collapse the rotation
        assert sizes[True] < 0.5 * sizes[False], sizes

    def test_rotation_depth_beyond_history_raises(self, tmp_path):
        frames = self._rot_clip()
        comp = ImprovedVideoCompressor(verbose=False,
                                       keyframe_interval=len(frames))
        p = str(tmp_path / "r.bfvc")
        comp.compress_video(frames, p)
        _, payloads = container.read_bfvc(p)
        idx = next(i for i, x in enumerate(payloads)
                   if x[0] == fc.ROT_G and x[1] >= 2)
        moved = [payloads[0], payloads[idx]]
        p2 = str(tmp_path / "early.bfvc")
        container.write_bfvc(p2, moved, container.MAGIC_BLOOM)
        with pytest.raises(ValueError, match="history"):
            comp.decompress_video(p2)
