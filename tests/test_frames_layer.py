"""Frames-layer tests: color/median parity vs OpenCV, diff round-trips,
frame records, container I/O, and golden-format parity with fixtures
produced by running the reference implementation itself."""

import os
import struct

import numpy as np
import pytest

from new_bloom_filter_repo_tpu.models.binary_codec import BloomFilterCompressor
from new_bloom_filter_repo_tpu.models import frame_codec as fc
from new_bloom_filter_repo_tpu.ops import color, diff, median
from new_bloom_filter_repo_tpu.utils import container
from new_bloom_filter_repo_tpu.utils.yuvframe import YUVFrame

import jax.numpy as jnp

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def rand_img(h=37, w=53, c=3, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w, c) if c else (h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Color conversion parity vs cv2
# ---------------------------------------------------------------------------

class TestColorParity:
    cv2 = pytest.importorskip("cv2")

    def test_bgr_to_gray_matches_cv2_luma(self):
        img = rand_img(seed=1)
        got = np.asarray(color.bgr_to_gray(jnp.asarray(img))).astype(int)
        # Bit-exact against cv2's BGR2YUV luma (classic shift-14 kernel) ...
        want_y = self.cv2.cvtColor(img, self.cv2.COLOR_BGR2YUV)[..., 0]
        np.testing.assert_array_equal(got, want_y.astype(int))
        # ... and within 1 of COLOR_BGR2GRAY (whose rounding drifts across
        # OpenCV releases; cv2 5.0's GRAY differs from its own YUV luma).
        want_g = self.cv2.cvtColor(img, self.cv2.COLOR_BGR2GRAY)
        assert np.abs(got - want_g.astype(int)).max() <= 1

    def test_bgr_to_yuv(self):
        img = rand_img(seed=2)
        got = np.asarray(color.bgr_to_yuv(jnp.asarray(img))).astype(int)
        want = self.cv2.cvtColor(img, self.cv2.COLOR_BGR2YUV).astype(int)
        np.testing.assert_array_equal(got[..., 0], want[..., 0])  # Y exact
        assert np.abs(got - want).max() <= 1  # chroma ties within 1

    def test_yuv_to_bgr(self):
        img = rand_img(seed=3)
        got = np.asarray(color.yuv_to_bgr(jnp.asarray(img))).astype(int)
        want = self.cv2.cvtColor(img, self.cv2.COLOR_YUV2BGR).astype(int)
        assert np.abs(got - want).max() <= 1

    def test_gray_roundtrip_channels(self):
        img = rand_img(seed=4)
        np.testing.assert_array_equal(
            np.asarray(color.bgr_to_rgb(jnp.asarray(img))), img[..., ::-1])


class TestMedianParity:
    cv2 = pytest.importorskip("cv2")

    @pytest.mark.parametrize("ksize", [3, 5])
    def test_median_blur_gray(self, ksize):
        img = rand_img(c=0, seed=5)
        got = np.asarray(median.median_blur(jnp.asarray(img), ksize))
        want = self.cv2.medianBlur(img, ksize)
        np.testing.assert_array_equal(got, want)

    def test_noise_level_close_to_reference_formula(self):
        img = rand_img(c=0, seed=6)
        sm = self.cv2.medianBlur(img, 5)
        want = np.std(img.astype(np.float32) - sm.astype(np.float32))
        got = float(median.noise_level(jnp.asarray(img)))
        assert abs(got - want) < 1e-3


# ---------------------------------------------------------------------------
# Diff extraction / application
# ---------------------------------------------------------------------------

class TestDiff:
    def test_exact_mask_roundtrip_color(self):
        prev, curr = rand_img(seed=7), rand_img(seed=8)
        mask = np.asarray(diff.diff_mask_exact(jnp.asarray(prev), jnp.asarray(curr)))
        vals = diff.gather_changed_values(curr, mask)
        rec = diff.apply_diff(prev, mask, vals)
        np.testing.assert_array_equal(rec, curr)

    def test_exact_mask_roundtrip_gray(self):
        prev, curr = rand_img(c=0, seed=9), rand_img(c=0, seed=10)
        mask = np.asarray(diff.diff_mask_exact(jnp.asarray(prev), jnp.asarray(curr)))
        vals = diff.gather_changed_values(curr, mask)
        rec = diff.apply_diff(prev, mask, vals)
        np.testing.assert_array_equal(rec, curr)

    def test_exact_mask_catches_chroma_only_change(self):
        prev = rand_img(seed=11)
        curr = prev.copy()
        curr[5, 5] = [prev[5, 5, 0] ^ 1, prev[5, 5, 1], prev[5, 5, 2]]
        mask = np.asarray(diff.diff_mask_exact(jnp.asarray(prev), jnp.asarray(curr)))
        assert mask[5, 5] == 1 and mask.sum() == 1

    def test_thresholded_mask_matches_reference_semantics(self):
        prev, curr = rand_img(seed=12), rand_img(seed=13)
        thr = 17.0
        got = np.asarray(diff.diff_mask_thresholded(
            jnp.asarray(prev), jnp.asarray(curr), thr))
        pg = np.asarray(color.bgr_to_gray(jnp.asarray(prev))).astype(np.int16)
        cg = np.asarray(color.bgr_to_gray(jnp.asarray(curr))).astype(np.int16)
        want = (np.abs(pg - cg) > thr).astype(np.uint8)
        np.testing.assert_array_equal(got, want)

    def test_thresholded_mask_direct_yuv_uses_y_channel(self):
        prev, curr = rand_img(seed=21), rand_img(seed=22)
        got = np.asarray(diff.diff_mask_thresholded(
            jnp.asarray(prev), jnp.asarray(curr), 10.0, use_direct_yuv=True))
        d = np.abs(prev[..., 0].astype(np.int16) - curr[..., 0].astype(np.int16))
        np.testing.assert_array_equal(got, (d > 10.0).astype(np.uint8))

    def test_yuv_plane_gather_and_apply(self):
        prev = YUVFrame(rand_img(seed=14))
        curr = YUVFrame(rand_img(seed=15))
        mask = np.asarray(diff.diff_mask_exact(
            jnp.asarray(prev.data), jnp.asarray(curr.data)))
        vals = diff.gather_changed_values(curr.data, mask, curr.yuv_info)
        rec_info = {k: (v.copy() if hasattr(v, "copy") else v)
                    for k, v in prev.yuv_info.items()}
        rec = diff.apply_diff(prev.data, mask, vals, rec_info)
        np.testing.assert_array_equal(rec, curr.data)
        np.testing.assert_array_equal(rec_info["y_plane"], curr.yuv_info["y_plane"])
        np.testing.assert_array_equal(rec_info["u_plane"], curr.yuv_info["u_plane"])
        np.testing.assert_array_equal(rec_info["v_plane"], curr.yuv_info["v_plane"])


# ---------------------------------------------------------------------------
# Frame records
# ---------------------------------------------------------------------------

class TestKeyframeRecords:
    @pytest.mark.parametrize("typed", [False, True])
    def test_roundtrip_color(self, typed):
        img = rand_img(seed=16)
        rec = fc.encode_keyframe(img, typed=typed)
        off = 1 if typed else 0
        if typed:
            assert fc.record_type(rec) == fc.KEYFRAME
        out, info = fc.decode_keyframe(rec, offset=off)
        np.testing.assert_array_equal(out, img)
        assert info is None

    def test_roundtrip_gray_uint16_float32(self):
        for dtype in (np.uint8, np.uint16, np.float32):
            img = rand_img(c=0, seed=17).astype(dtype)
            out, _ = fc.decode_keyframe(fc.encode_keyframe(img))
            np.testing.assert_array_equal(out, img)
            assert out.dtype == dtype

    def test_roundtrip_yuv_planes(self):
        f = YUVFrame(rand_img(seed=18))
        rec = fc.encode_keyframe(f.data, f.yuv_info)
        out, info = fc.decode_keyframe(rec)
        np.testing.assert_array_equal(out, f.data)
        assert info["format"] == "YUV444"
        np.testing.assert_array_equal(info["y_plane"], f.yuv_info["y_plane"])

    def test_untyped_record_matches_reference_bytes(self):
        """Our encoder must produce byte-identical records to the reference
        (zlib level 9 on the same zlib makes this deterministic)."""
        frames = np.load(os.path.join(FIXTURES, "golden_frames.npz"))["bgr"]
        with open(os.path.join(FIXTURES, "golden_keyframes_bgr.bin"), "rb") as f:
            data = f.read()
        count = struct.unpack_from("<I", data, 0)[0]
        off = 4
        for i in range(count):
            ln = struct.unpack_from("<I", data, off)[0]
            off += 4
            ref_rec = data[off:off + ln]
            off += ln
            ours = fc.encode_keyframe(frames[i])
            assert ours == ref_rec, f"frame {i} record mismatch"

    def test_decodes_reference_yuv_records(self):
        frames = np.load(os.path.join(FIXTURES, "golden_frames.npz"))["yuv"]
        with open(os.path.join(FIXTURES, "golden_keyframes_yuv.bin"), "rb") as f:
            data = f.read()
        count = struct.unpack_from("<I", data, 0)[0]
        off = 4
        for i in range(count):
            ln = struct.unpack_from("<I", data, off)[0]
            off += 4
            out, info = fc.decode_keyframe(data[off:off + ln])
            off += ln
            np.testing.assert_array_equal(out, frames[i])
            assert info is not None
            np.testing.assert_array_equal(info["y_plane"], frames[i][:, :, 0])


class TestInterframeRecords:
    def test_roundtrip(self):
        codec = BloomFilterCompressor()
        prev, curr = rand_img(seed=19), rand_img(seed=19)
        curr = curr.copy()
        curr[3:9, 4:12] ^= 255  # localized change -> sparse mask
        mask = np.asarray(diff.diff_mask_exact(jnp.asarray(prev), jnp.asarray(curr)))
        vals = diff.gather_changed_values(curr, mask)
        rec = fc.encode_interframe(mask, vals, codec)
        assert fc.record_type(rec) == fc.INTERFRAME
        flat, values = fc.decode_interframe(rec, codec, offset=1)
        np.testing.assert_array_equal(flat.reshape(mask.shape), mask)
        np.testing.assert_array_equal(values, vals)
        rec2 = diff.apply_diff(prev, flat.reshape(mask.shape), values)
        np.testing.assert_array_equal(rec2, curr)

    def test_dense_mask_passthrough_branch(self):
        codec = BloomFilterCompressor()
        rng = np.random.default_rng(20)
        mask = (rng.random((24, 32)) < 0.6).astype(np.uint8)  # p >= P*
        vals = np.arange(int(mask.sum()) * 1, dtype=np.uint8)
        rec = fc.encode_interframe(mask, vals, codec)
        flat, values = fc.decode_interframe(rec, codec, offset=1)
        np.testing.assert_array_equal(flat.reshape(mask.shape), mask)
        np.testing.assert_array_equal(values, vals)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

class TestContainer:
    def test_roundtrip(self, tmp_path):
        payloads = [b"abc", b"", b"\x00" * 100]
        p = str(tmp_path / "x.bfvc")
        container.write_bfvc(p, payloads)
        magic, got = container.read_bfvc(p)
        assert magic == container.MAGIC_FIXED
        assert got == payloads

    def test_reads_reference_container(self):
        magic, payloads = container.read_bfvc(
            os.path.join(FIXTURES, "golden_ref.bfvc"))
        assert magic == container.MAGIC_FIXED
        frames = np.load(os.path.join(FIXTURES, "golden_frames.npz"))["bgr"]
        assert len(payloads) == len(frames)
        for i, payload in enumerate(payloads):
            out, _ = fc.decode_keyframe(payload)
            np.testing.assert_array_equal(out, frames[i])

    def test_bad_magic_raises(self, tmp_path):
        p = str(tmp_path / "bad.bfvc")
        with open(p, "wb") as f:
            f.write(b"NOPE" + b"\x00" * 8)
        with pytest.raises(ValueError, match="Invalid file format"):
            container.read_bfvc(p)


def test_typed_keyframe_plane_elision_flags():
    """Typed keyframes elide redundancy: flag 2 (444 wrapper planes =
    channels) and flag 3 (frame = chroma replication of native planes);
    both decode back bit-exactly with planes intact."""
    rng = np.random.default_rng(8)
    h, w = 32, 48
    # flag 2: 444 wrapper
    frame = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    info444 = {"format": "YUV444", "y_plane": frame[:, :, 0].copy(),
               "u_plane": frame[:, :, 1].copy(),
               "v_plane": frame[:, :, 2].copy()}
    rec = fc.encode_keyframe(frame, info444, typed=True)
    assert rec[0] == fc.KEYFRAME
    dec, info = fc.decode_keyframe(rec, offset=1)
    np.testing.assert_array_equal(dec, frame)
    np.testing.assert_array_equal(info["u_plane"], info444["u_plane"])
    plain = fc.encode_keyframe(frame, None, typed=True)
    assert len(rec) < len(plain) + 64  # no duplicate plane streams

    # flag 3: 4:2:0 wrapper (frame is replication of native planes)
    y = rng.integers(0, 255, (h, w), dtype=np.uint8)
    u = rng.integers(0, 255, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 255, (h // 2, w // 2), dtype=np.uint8)
    f420 = np.stack([y, np.repeat(np.repeat(u, 2, 0), 2, 1),
                     np.repeat(np.repeat(v, 2, 0), 2, 1)], axis=-1)
    info420 = {"format": "I420", "y_plane": y, "u_plane": u, "v_plane": v}
    rec3 = fc.encode_keyframe(f420, info420, typed=True)
    dec3, i3 = fc.decode_keyframe(rec3, offset=1)
    np.testing.assert_array_equal(dec3, f420)
    np.testing.assert_array_equal(i3["u_plane"], u)
    assert i3["format"] == "I420"
    # only the native planes are stored: much smaller than frame+planes
    ref_layout = fc.encode_keyframe(f420, info420, typed=False)
    assert len(rec3) < 0.55 * len(ref_layout)

    # untyped records keep the reference layout (flag 1) for parity
    assert ref_layout[16 + int.from_bytes(ref_layout[12:16], "little")] == 1

    # lossy wrapper (planes disagree with frame) falls back to flag 1
    bad = dict(info420)
    bad["u_plane"] = u ^ 1
    rec1 = fc.encode_keyframe(f420, bad, typed=True)
    dec1, i1 = fc.decode_keyframe(rec1, offset=1)
    np.testing.assert_array_equal(dec1, f420)
    np.testing.assert_array_equal(i1["u_plane"], bad["u_plane"])
