"""End-to-end tests for the public video API.

Covers the reference's verification philosophy (SURVEY.md §4): exact
array_equal round-trips at frame and video level in BGR/RGB/YUV/gray,
keyframe scheduling, reference-container interop, and the stats surface.
"""

import os

import numpy as np
import pytest

from new_bloom_filter_repo_tpu.models.video import (
    FixedVideoCompressor,
    ImprovedVideoCompressor,
    add_yuv_info_to_frame,
    verify_lossless,
)
from new_bloom_filter_repo_tpu.utils import container

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def make_video(n=8, h=40, w=56, c=3, noise=4, seed=0, move=True):
    """Synthetic clip: static noisy background + moving rectangle."""
    rng = np.random.default_rng(seed)
    shape = (h, w, c) if c else (h, w)
    base = rng.integers(0, 200, size=shape, dtype=np.uint8)
    frames = []
    for i in range(n):
        f = base.copy()
        if noise:
            m = rng.random(shape[:2]) < 0.02  # sparse sensor noise
            if c:
                f[m] = rng.integers(0, 256, size=(int(m.sum()), c))
            else:
                f[m] = rng.integers(0, 256, size=int(m.sum()))
        x = (3 + 4 * i) if move else 3
        if c:
            f[8:20, x:x + 10, :] = (255, 128, 0)
        else:
            f[8:20, x:x + 10] = 255
        frames.append(f)
    return frames


class TestFixedCompressor:
    def test_roundtrip_color(self):
        comp = FixedVideoCompressor(verbose=False)
        frames = make_video()
        rec = comp.decompress_video(comp.compress_video(frames))
        res = comp.verify_lossless(frames, rec)
        assert res["lossless"] and res["exact_frame_matches"] == len(frames)

    def test_roundtrip_yuv_wrapped(self):
        comp = FixedVideoCompressor(verbose=False)
        frames = [add_yuv_info_to_frame(f) for f in make_video(4)]
        rec = comp.decompress_video(comp.compress_video(frames))
        assert comp.verify_lossless(frames, rec)["lossless"]
        assert hasattr(rec[0], "yuv_info")
        np.testing.assert_array_equal(
            rec[0].yuv_info["u_plane"], frames[0].yuv_info["u_plane"])


class TestImprovedCompressor:
    @pytest.mark.parametrize("cs", ["BGR", "RGB"])
    def test_bloom_mode_roundtrip(self, tmp_path, cs):
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=5)
        frames = make_video(12)
        out = str(tmp_path / "clip.bfvc")
        res = comp.compress_video(frames, out, input_color_space=cs)
        assert res["keyframes"] == 3  # frames 0, 5, 10
        rec = comp.decompress_video(out)
        v = comp.verify_lossless(frames, rec)
        assert v["lossless"], v
        assert res["compression_ratio"] < 1.0

    def test_bloom_beats_keyframe_only_on_static_content(self, tmp_path):
        frames = make_video(16, noise=0)
        bloom = ImprovedVideoCompressor(verbose=False, keyframe_interval=16)
        key = ImprovedVideoCompressor(verbose=False, mode="keyframe")
        rb = bloom.compress_video(frames, str(tmp_path / "b.bfvc"))
        rk = key.compress_video(frames, str(tmp_path / "k.bfvc"))
        assert rb["compression_ratio"] < rk["compression_ratio"]
        rec = bloom.decompress_video(str(tmp_path / "b.bfvc"))
        assert bloom.verify_lossless(frames, rec)["lossless"]

    def test_yuv_direct_roundtrip(self, tmp_path):
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=4,
                                       use_direct_yuv=True)
        frames = [add_yuv_info_to_frame(f) for f in make_video(8, seed=5)]
        out = str(tmp_path / "yuv.bfvc")
        comp.compress_video(frames, out, input_color_space="YUV")
        rec = comp.decompress_video(out)
        v = comp.verify_lossless(frames, rec)
        assert v["lossless"], v
        assert hasattr(rec[3], "yuv_info")
        np.testing.assert_array_equal(
            rec[3].yuv_info["v_plane"], np.asarray(frames[3])[:, :, 2])

    def test_grayscale_roundtrip(self, tmp_path):
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=6)
        frames = make_video(9, c=0, seed=2)
        out = str(tmp_path / "gray.bfvc")
        comp.compress_video(frames, out)
        rec = comp.decompress_video(out)
        assert comp.verify_lossless(frames, rec)["lossless"]

    def test_keyframe_mode_reference_compatible(self, tmp_path):
        comp = ImprovedVideoCompressor(verbose=False, mode="keyframe")
        frames = make_video(5, seed=3)
        out = str(tmp_path / "ref.bfvc")
        comp.compress_video(frames, out)
        magic, _ = container.read_bfvc(out)
        assert magic == container.MAGIC_FIXED
        rec = comp.decompress_video(out)
        assert comp.verify_lossless(frames, rec)["lossless"]

    def test_decodes_reference_produced_bfvc(self):
        """Files written by the actual reference implementation decode
        bit-exactly (golden fixture)."""
        comp = ImprovedVideoCompressor(verbose=False)
        frames = np.load(os.path.join(FIXTURES, "golden_frames.npz"))["bgr"]
        rec = comp.decompress_video(os.path.join(FIXTURES, "golden_ref.bfvc"))
        assert len(rec) == len(frames)
        for i in range(len(frames)):
            np.testing.assert_array_equal(np.asarray(rec[i]), frames[i])

    def test_keyframe_mode_writes_reference_identical_bytes(self, tmp_path):
        """mode='keyframe' output is byte-identical to the reference's
        .bfvc for the same frames."""
        frames = np.load(os.path.join(FIXTURES, "golden_frames.npz"))["bgr"]
        comp = ImprovedVideoCompressor(verbose=False, mode="keyframe")
        out = str(tmp_path / "ours.bfvc")
        comp.compress_video(list(frames), out)
        with open(out, "rb") as f:
            ours = f.read()
        with open(os.path.join(FIXTURES, "golden_ref.bfvc"), "rb") as f:
            ref = f.read()
        assert ours == ref

    def test_near_lossless_mode_is_deterministic_not_drifting(self, tmp_path):
        """exact=False reproduces the reference's noise-tolerant semantics;
        decode must exactly equal the encoder's own reconstruction."""
        comp = ImprovedVideoCompressor(verbose=False, exact=False,
                                       noise_tolerance=10.0,
                                       keyframe_interval=8)
        # High-contrast moving object so its gray delta clears the
        # adaptive threshold everywhere.
        frames = make_video(8, noise=4, seed=7)
        for i, f in enumerate(frames):
            f[8:20, 3 + 4 * i:13 + 4 * i, :] = 255
        out = str(tmp_path / "nl.bfvc")
        comp.compress_video(frames, out)
        rec1 = comp.decompress_video(out)
        rec2 = comp.decompress_video(out)
        for a, b in zip(rec1, rec2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # moving object is substantially preserved even in near-lossless
        # mode (sub-threshold pixels may legitimately keep old values)
        patch = np.asarray(rec1[-1])[8:20, 31:41]
        frac = (patch == 255).all(axis=-1).mean()
        assert frac > 0.9, frac

    def test_stats_dict_surface(self, tmp_path):
        comp = ImprovedVideoCompressor(verbose=False)
        res = comp.compress_video(make_video(4), str(tmp_path / "s.bfvc"))
        for key in ("frame_count", "original_size", "compressed_size",
                    "compression_ratio", "space_savings", "compression_time",
                    "frames_per_second", "keyframes", "keyframe_ratio",
                    "output_path", "color_space", "overall_ratio"):
            assert key in res

    def test_empty_frames_raises(self):
        with pytest.raises(ValueError, match="No frames"):
            ImprovedVideoCompressor(verbose=False).compress_video([])

    def test_verify_lossless_detects_difference(self):
        frames = make_video(3)
        bad = [f.copy() for f in frames]
        bad[1][0, 0, 0] ^= 1
        res = verify_lossless(frames, bad)
        assert not res["lossless"]
        assert res["diff_frames"] == [1]
        assert res["exact_frame_matches"] == 2

    def test_verify_frame_count_mismatch(self):
        frames = make_video(3)
        res = verify_lossless(frames, frames[:2])
        assert not res["lossless"] and "mismatch" in res["reason"]


class TestProfiles:
    def test_bfv2_profile_emits_reference_layout_records(self, tmp_path):
        """profile='bfv2' produces type-0 bloom records decodable by the
        same decoder (reference diff layout end to end)."""
        from new_bloom_filter_repo_tpu.models import frame_codec as fc
        frames = make_video(6, h=32, w=40, noise=2)
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=6,
                                       profile="bfv2")
        out = str(tmp_path / "b2.bfvc")
        comp.compress_video(frames, out)
        magic, payloads = container.read_bfvc(out)
        types = [fc.record_type(p) for p in payloads]
        assert types[0] == fc.KEYFRAME
        assert all(t in (fc.INTERFRAME, fc.KEYFRAME) for t in types)
        assert fc.INTERFRAME in types
        rec = comp.decompress_video(out)
        assert comp.verify_lossless(frames, rec)["lossless"]

    def test_blocked_profile_records(self, tmp_path):
        from new_bloom_filter_repo_tpu.models import frame_codec as fc
        frames = make_video(6, h=32, w=40, noise=2)
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=6)
        out = str(tmp_path / "b3.bfvc")
        comp.compress_video(frames, out)
        _, payloads = container.read_bfvc(out)
        types = set(fc.record_type(p) for p in payloads[1:])
        assert types <= {fc.BLOCKED, fc.SPARSE, fc.EMPTY, fc.INTERFRAME,
                         fc.KEYFRAME, fc.BLOCKED_Z, fc.MOTION}

    def test_cross_profile_decode(self, tmp_path):
        """A bfv2-profile file and a blocked-profile file of the same clip
        decode to identical frames."""
        frames = make_video(5, h=32, w=40, noise=2, seed=8)
        a = ImprovedVideoCompressor(verbose=False, profile="bfv2",
                                    keyframe_interval=5)
        b = ImprovedVideoCompressor(verbose=False, profile="blocked",
                                    keyframe_interval=5)
        pa, pb = str(tmp_path / "a.bfvc"), str(tmp_path / "b.bfvc")
        a.compress_video(frames, pa)
        b.compress_video(frames, pb)
        ra = ImprovedVideoCompressor(verbose=False).decompress_video(pa)
        rb = ImprovedVideoCompressor(verbose=False).decompress_video(pb)
        for x, y in zip(ra, rb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_bogus_profile_raises(self):
        with pytest.raises(ValueError, match="profile"):
            ImprovedVideoCompressor(profile="nope")


class TestWeirdGeometries:
    @pytest.mark.parametrize("h,w,c", [(2, 2, 3), (1, 7, 0), (3, 1, 3),
                                       (17, 19, 3)])
    def test_tiny_and_odd_shapes(self, tmp_path, h, w, c):
        rng = np.random.default_rng(h * 100 + w)
        shape = (h, w, c) if c else (h, w)
        frames = [rng.integers(0, 256, shape, dtype=np.uint8)
                  for _ in range(3)]
        frames[1] = frames[0].copy()
        if c:
            frames[1][0, 0, 0] ^= 1
        else:
            frames[1][0, 0] ^= 1
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=3)
        out = str(tmp_path / "t.bfvc")
        comp.compress_video(frames, out)
        rec = comp.decompress_video(out)
        assert comp.verify_lossless(frames, rec)["lossless"]

    def test_mixed_shapes_fall_back_to_keyframes(self, tmp_path):
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8),
                  rng.integers(0, 256, (16, 8, 3), dtype=np.uint8)]
        comp = ImprovedVideoCompressor(verbose=False)
        out = str(tmp_path / "m.bfvc")
        res = comp.compress_video(frames, out)
        assert res["keyframes"] == 2
        rec = comp.decompress_video(out)
        assert comp.verify_lossless(frames, rec)["lossless"]


class TestFourChannel:
    def test_bgra_frames_roundtrip_via_loop_path(self, tmp_path):
        rng = np.random.default_rng(0)
        base = rng.integers(0, 256, (16, 20, 4), dtype=np.uint8)
        frames = [base.copy() for _ in range(4)]
        for i in range(1, 4):
            frames[i][2:6, 3 + 2 * i:8 + 2 * i] = (9, 8, 7, 6)
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=4)
        out = str(tmp_path / "rgba.bfvc")
        comp.compress_video(frames, out)
        rec = comp.decompress_video(out)
        assert comp.verify_lossless(frames, rec)["lossless"]

    def test_missing_input_path_raises_filenotfound(self):
        comp = ImprovedVideoCompressor(verbose=False)
        with pytest.raises(FileNotFoundError):
            comp.decompress_video("/definitely/not/here.bfvc")


@pytest.mark.slow
class TestMultiChip:
    """Multi-chip through the PUBLIC API: devices= shards frames over dp
    (and blocks over sp) with a bitstream identical to single-device."""

    def _clip(self):
        return make_video(n=20, h=48, w=64, seed=7)

    def test_devices_int_bitstream_identical(self, tmp_path):
        frames = self._clip()
        p1 = str(tmp_path / "single.bfvc")
        p8 = str(tmp_path / "dp8.bfvc")
        ImprovedVideoCompressor(verbose=False).compress_video(frames, p1)
        comp8 = ImprovedVideoCompressor(verbose=False, devices=8)
        comp8.compress_video(frames, p8)
        with open(p1, "rb") as f1, open(p8, "rb") as f8:
            assert f1.read() == f8.read()
        rec = comp8.decompress_video(p8)
        assert verify_lossless(frames, rec)["lossless"]

    def test_devices_mesh_dpsp_roundtrip(self, tmp_path):
        import jax
        from new_bloom_filter_repo_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(2, 4, jax.devices("cpu"))
        frames = self._clip()
        p1 = str(tmp_path / "single.bfvc")
        pm = str(tmp_path / "mesh.bfvc")
        ImprovedVideoCompressor(verbose=False).compress_video(frames, p1)
        comp = ImprovedVideoCompressor(verbose=False, devices=mesh)
        comp.compress_video(frames, pm)
        with open(p1, "rb") as f1, open(pm, "rb") as f2:
            assert f1.read() == f2.read()
        rec = ImprovedVideoCompressor(verbose=False,
                                      devices="auto").decompress_video(pm)
        assert verify_lossless(frames, rec)["lossless"]

    def test_devices_validation(self):
        with pytest.raises(ValueError):
            ImprovedVideoCompressor(devices="everything")
        assert ImprovedVideoCompressor(devices=1).mesh is None
        assert ImprovedVideoCompressor(devices=None).mesh is None

    def test_devices_tuple_reserves_sp_axis(self):
        comp = ImprovedVideoCompressor(devices=(4, 2))
        assert dict(comp.mesh.shape) == {"dp": 4, "sp": 2}
        assert ImprovedVideoCompressor(devices=(1, 1)).mesh is None

    def test_bfv2_profile_devices_bitstream_identical(self, tmp_path):
        """profile='bfv2' also honors devices=: gop masks/encode/decode
        run frame-sharded with a byte-identical stream."""
        frames = self._clip()
        p1 = str(tmp_path / "single.bfvc")
        p8 = str(tmp_path / "dp8.bfvc")
        ImprovedVideoCompressor(verbose=False, profile="bfv2",
                                keyframe_interval=8).compress_video(
                                    frames, p1)
        comp8 = ImprovedVideoCompressor(verbose=False, profile="bfv2",
                                        keyframe_interval=8, devices=8)
        comp8.compress_video(frames, p8)
        with open(p1, "rb") as f1, open(p8, "rb") as f8:
            assert f1.read() == f8.read()
        rec = comp8.decompress_video(p8)
        assert verify_lossless(frames, rec)["lossless"]
        # the sharded decode programs were actually used
        assert any(k[0] == "enc" for k in comp8._gop_progs)
        assert any(k[0] == "dec" for k in comp8._gop_progs)


class TestPlanarProfile:
    """profile="planar": native-subsampling plane coding with raw-byte
    round trip (the semantics improved_video_compressor.py:810-842 only
    gestures at with use_direct_yuv)."""

    def _write_i420(self, path, n=10, w=64, h=48, seed=5):
        rng = np.random.default_rng(seed)
        base_y = rng.integers(0, 220, (h, w), dtype=np.uint8)
        base_u = rng.integers(0, 220, (h // 2, w // 2), dtype=np.uint8)
        base_v = rng.integers(0, 220, (h // 2, w // 2), dtype=np.uint8)
        with open(path, "wb") as f:
            for i in range(n):
                y = base_y.copy()
                y[8:16, 2 + 3 * i: 10 + 3 * i] = 255
                noise = rng.random((h, w)) < 0.02
                y[noise] = rng.integers(0, 256, int(noise.sum()))
                u = base_u.copy()
                u[2:6, 2:6] = min(255, 10 * i)
                v = base_v.copy()
                f.write(y.tobytes())
                f.write(u.tobytes())
                f.write(v.tobytes())
        return str(path)

    @pytest.mark.slow
    def test_process_yuv_raw_byte_roundtrip(self, tmp_path):
        src = self._write_i420(tmp_path / "clip.yuv")
        comp = ImprovedVideoCompressor(verbose=False, profile="planar",
                                       use_direct_yuv=True,
                                       keyframe_interval=5)
        frames = comp.extract_frames_from_video(src, width=64, height=48,
                                                format="I420")
        out = str(tmp_path / "clip.bfvc")
        res = comp.compress_video(frames, out, input_color_space="YUV")
        rec_yuv = str(tmp_path / "rec.yuv")
        rec = comp.decompress_video(out, rec_yuv)
        with open(src, "rb") as a, open(rec_yuv, "rb") as b:
            assert a.read() == b.read()
        assert verify_lossless(frames, rec)["lossless"]
        # honest ratio: original_size is the true raw plane byte count
        assert res["original_size"] == os.path.getsize(src)
        # native planes are exact, not just the 444 view
        for f, r in zip(frames, rec):
            for pl in ("y_plane", "u_plane", "v_plane"):
                np.testing.assert_array_equal(
                    np.asarray(f.yuv_info[pl]), np.asarray(r.yuv_info[pl]))
            assert r.yuv_info["u_plane"].shape == (24, 32)

    def test_blocked_profile_i420_export_geometry(self, tmp_path):
        """The BLOCKED profile on I420 input must export consistent
        native-geometry planes for every frame (regression: inter frames
        used to rebuild full-res planes after a flag-3 keyframe, writing
        a silently corrupt .yuv/.y4m)."""
        src = self._write_i420(tmp_path / "clip.yuv", n=8)
        comp = ImprovedVideoCompressor(verbose=False, profile="blocked",
                                       keyframe_interval=4)
        frames = comp.extract_frames_from_video(src, width=64, height=48,
                                                format="I420")
        out = str(tmp_path / "clip.bfvc")
        comp.compress_video(frames, out, input_color_space="YUV")
        rec_yuv = str(tmp_path / "rec.yuv")
        rec = comp.decompress_video(out, rec_yuv)
        # every decoded frame carries native-geometry planes, byte-exact
        for f, r in zip(frames, rec):
            for pl, shape in (("y_plane", (48, 64)), ("u_plane", (24, 32)),
                              ("v_plane", (24, 32))):
                got = np.asarray(r.yuv_info[pl])
                assert got.shape == shape, (pl, got.shape)
                np.testing.assert_array_equal(
                    np.asarray(f.yuv_info[pl]), got)
        # the raw export reproduces the input bytes exactly
        with open(src, "rb") as a, open(rec_yuv, "rb") as b:
            assert a.read() == b.read()

    def test_planar_beats_444_on_i420(self, tmp_path):
        """Coding half the samples must beat coding the upconversion."""
        src = self._write_i420(tmp_path / "clip.yuv", n=12)
        planar = ImprovedVideoCompressor(verbose=False, profile="planar")
        frames = planar.extract_frames_from_video(src, width=64, height=48,
                                                  format="I420")
        r_planar = planar.compress_video(
            frames, str(tmp_path / "p.bfvc"), input_color_space="YUV")
        full = ImprovedVideoCompressor(verbose=False)
        r_full = full.compress_video(
            frames, str(tmp_path / "f.bfvc"), input_color_space="YUV")
        assert (r_planar["compressed_size"] < r_full["compressed_size"])

    def test_planar_rejects_non_uint8_planes(self):
        """Non-uint8 planes must raise, not silently truncate (10-bit
        video would otherwise corrupt at compress time)."""
        from new_bloom_filter_repo_tpu.utils.yuvframe import YUVFrame
        rng = np.random.default_rng(3)
        frames = []
        for _ in range(3):
            y = rng.integers(0, 1023, (16, 16), dtype=np.uint16)
            u = rng.integers(0, 1023, (8, 8), dtype=np.uint16)
            v = rng.integers(0, 1023, (8, 8), dtype=np.uint16)
            y8 = (y >> 2).astype(np.uint8)
            frames.append(YUVFrame(
                np.stack([y8, y8, y8], axis=-1),
                {"format": "I420", "y_plane": y, "u_plane": u,
                 "v_plane": v}))
        comp = ImprovedVideoCompressor(verbose=False, profile="planar")
        with pytest.raises(ValueError, match="uint8"):
            comp.compress_video(frames, input_color_space="YUV")

    def test_planar_cli_default_for_process_yuv(self, tmp_path):
        from new_bloom_filter_repo_tpu.cli import main as cli_main
        src = self._write_i420(tmp_path / "c.yuv", n=6)
        out = str(tmp_path / "c.bfvc")
        rc = cli_main(["process-yuv", src, out,
                       "--width", "64", "--height", "48"])
        assert rc == 0
        comp = ImprovedVideoCompressor(verbose=False)
        rec_yuv = str(tmp_path / "rec.yuv")
        comp.decompress_video(out, rec_yuv)
        with open(src, "rb") as a, open(rec_yuv, "rb") as b:
            assert a.read() == b.read()

    def test_planar_yv12_plane_order(self, tmp_path):
        """YV12 (V before U) normalizes on read and restores on write."""
        from new_bloom_filter_repo_tpu.utils import videoio
        src = self._write_i420(tmp_path / "c.yuv", n=4)  # bytes: Y,U,V
        # read the same bytes as YV12: u/v swapped in, swapped back out
        frames = videoio.read_raw_yuv(src, 64, 48, "YV12")
        rec = str(tmp_path / "rec.yuv")
        videoio.write_raw_yuv(rec, frames)
        with open(src, "rb") as a, open(rec, "rb") as b:
            assert a.read() == b.read()

    def test_planar_y4m_roundtrip(self, tmp_path):
        from new_bloom_filter_repo_tpu.utils import videoio
        h, w = 48, 64
        rng = np.random.default_rng(9)
        planes = []
        base = (rng.integers(0, 200, (h, w), np.uint8),
                rng.integers(0, 200, (h // 2, w // 2), np.uint8),
                rng.integers(0, 200, (h // 2, w // 2), np.uint8))
        for i in range(8):
            y = base[0].copy()
            y[4:12, 4 + 4 * i: 12 + 4 * i] = 200 + i
            planes.append((y, base[1], base[2]))
        src = str(tmp_path / "clip.y4m")
        videoio.write_y4m(src, planes, w, h)
        comp = ImprovedVideoCompressor(verbose=False, profile="planar")
        frames = comp.extract_frames_from_video(src,
                                                output_color_space="YUV")
        out = str(tmp_path / "clip.bfvc")
        comp.compress_video(frames, out, input_color_space="YUV")
        rec = comp.decompress_video(out)
        assert verify_lossless(frames, rec)["lossless"]
        for (y, u, v), r in zip(planes, rec):
            np.testing.assert_array_equal(y, r.yuv_info["y_plane"])
            np.testing.assert_array_equal(u, r.yuv_info["u_plane"])
            np.testing.assert_array_equal(v, r.yuv_info["v_plane"])


def test_prefetch_flag_identical_output(tmp_path):
    """Pipeline-overlap mode (prefetch=True) emits the same bytes."""
    frames = make_video(24, seed=11)
    a = str(tmp_path / "a.bfvc")
    b = str(tmp_path / "b.bfvc")
    ImprovedVideoCompressor(verbose=False, keyframe_interval=8
                            ).compress_video(frames, a)
    comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=8,
                                   prefetch=True)
    assert comp.prefetch
    comp.compress_video(frames, b)
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


@pytest.mark.slow
def test_planar_profile_with_devices_mesh(tmp_path):
    """planar profile and devices= sharding compose: byte-identical
    stream, plane-exact decode."""
    rng = np.random.default_rng(13)
    h, w = 48, 64
    frames = []
    base_y = rng.integers(0, 200, (h, w), dtype=np.uint8)
    base_u = rng.integers(0, 200, (h // 2, w // 2), dtype=np.uint8)
    base_v = rng.integers(0, 200, (h // 2, w // 2), dtype=np.uint8)
    from new_bloom_filter_repo_tpu.utils.yuvframe import YUVFrame
    for i in range(10):
        y = base_y.copy()
        y[8:16, 2 + 3 * i: 10 + 3 * i] = 250
        u444 = np.repeat(np.repeat(base_u, 2, 0), 2, 1)
        v444 = np.repeat(np.repeat(base_v, 2, 0), 2, 1)
        frames.append(YUVFrame(
            np.stack([y, u444, v444], axis=-1),
            {"format": "I420", "y_plane": y, "u_plane": base_u.copy(),
             "v_plane": base_v.copy()}))
    p1 = str(tmp_path / "p1.bfvc")
    p8 = str(tmp_path / "p8.bfvc")
    ImprovedVideoCompressor(verbose=False, profile="planar",
                            keyframe_interval=5).compress_video(
        frames, p1, input_color_space="YUV")
    comp8 = ImprovedVideoCompressor(verbose=False, profile="planar",
                                    keyframe_interval=5, devices=8)
    comp8.compress_video(frames, p8, input_color_space="YUV")
    with open(p1, "rb") as a, open(p8, "rb") as b:
        assert a.read() == b.read()
    rec = comp8.decompress_video(p8)
    for f, r in zip(frames, rec):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(r))
        np.testing.assert_array_equal(f.yuv_info["u_plane"],
                                      r.yuv_info["u_plane"])


def test_loop_path_with_native_subsampled_planes(tmp_path):
    """Near-lossless (loop) encode of frames carrying NATIVE subsampled
    planes must not index planes at frame resolution (regression: planes
    from read_raw_yuv/read_y4m are half-size for 4:2:0)."""
    from new_bloom_filter_repo_tpu.utils.yuvframe import YUVFrame
    rng = np.random.default_rng(3)
    h, w = 48, 64
    frames = []
    for i in range(5):
        y = rng.integers(0, 200, (h, w), dtype=np.uint8)
        y[10:20, 4 * i: 4 * i + 12] = 255
        u = rng.integers(90, 110, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(90, 110, (h // 2, w // 2), dtype=np.uint8)
        frames.append(YUVFrame(
            np.stack([y, np.repeat(np.repeat(u, 2, 0), 2, 1),
                      np.repeat(np.repeat(v, 2, 0), 2, 1)], axis=-1),
            {"format": "I420", "y_plane": y, "u_plane": u, "v_plane": v}))
    comp = ImprovedVideoCompressor(verbose=False, exact=False,
                                   use_direct_yuv=True,
                                   keyframe_interval=5)
    out = str(tmp_path / "nl.bfvc")
    comp.compress_video(frames, out, input_color_space="YUV")
    rec = comp.decompress_video(out)
    assert len(rec) == len(frames)


def test_bfv2_batched_encode_matches_loop_bytes(tmp_path):
    """The batched bfv2 encode (gop_masks + gop_encode, two dispatches
    per chunk) emits byte-identical records to the per-frame loop."""
    frames = make_video(10, h=40, w=56, seed=21)
    comp = ImprovedVideoCompressor(verbose=False, profile="bfv2",
                                   keyframe_interval=10)
    batched, kb = comp._encode_frames(frames)
    loop, kl = comp._encode_frames_loop(frames)
    assert kb == kl
    assert len(batched) == len(loop)
    for i, (a, b) in enumerate(zip(batched, loop)):
        assert a == b, f"record {i} differs"
    # and it round-trips through the container
    out = str(tmp_path / "b2.bfvc")
    comp.compress_video(frames, out)
    rec = comp.decompress_video(out)
    assert verify_lossless(frames, rec)["lossless"]


def test_bfv2_batched_scene_cut_fallback(tmp_path):
    """Dense masks (scene cut) keep the loop policy: keyframe when not
    larger."""
    rng = np.random.default_rng(31)
    frames = [rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
              for _ in range(6)]  # every frame a full scene change
    comp = ImprovedVideoCompressor(verbose=False, profile="bfv2",
                                   keyframe_interval=6)
    batched, kb = comp._encode_frames(frames)
    loop, kl = comp._encode_frames_loop(frames)
    assert kb == kl and batched == loop
    out = str(tmp_path / "cut.bfvc")
    comp.compress_video(frames, out)
    rec = comp.decompress_video(out)
    assert verify_lossless(frames, rec)["lossless"]


@pytest.mark.slow
def test_chunk_size_cross_compat(tmp_path, monkeypatch):
    """A stream encoded with one device chunk size decodes with another
    (records are per-frame; NBF_CHUNK only shapes batching)."""
    from new_bloom_filter_repo_tpu.models import video as video_mod
    frames = make_video(14, seed=17)
    out = str(tmp_path / "c.bfvc")
    ImprovedVideoCompressor(verbose=False, keyframe_interval=14
                            ).compress_video(frames, out)
    monkeypatch.setattr(video_mod, "_CHUNK", 5)
    comp = ImprovedVideoCompressor(verbose=False)
    rec = comp.decompress_video(out)
    assert verify_lossless(frames, rec)["lossless"]
    # and encode with the small chunk, decode with the default
    out2 = str(tmp_path / "c2.bfvc")
    comp.compress_video(frames, out2)
    monkeypatch.undo()
    rec2 = ImprovedVideoCompressor(verbose=False).decompress_video(out2)
    assert verify_lossless(frames, rec2)["lossless"]
