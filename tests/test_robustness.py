"""Robustness: corrupted streams must raise, never crash, hang, or
return silently-wrong data; exotic raw-YUV layouts round-trip."""

import numpy as np
import pytest

from new_bloom_filter_repo_tpu.models.video import ImprovedVideoCompressor
from new_bloom_filter_repo_tpu.utils import container, videoio
from new_bloom_filter_repo_tpu.utils.synthetic import generate_frames


def make_stream(tmp_path, n=5, **kw):
    frames = generate_frames(n, 48, 64, noise=2.0, seed=3,
                             color_space=kw.pop("color_space", "BGR"))
    comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=3,
                                   **kw)
    p = str(tmp_path / "ok.bfvc")
    comp.compress_video(frames, p)
    with open(p, "rb") as f:
        return frames, f.read()


class TestCorruption:
    @pytest.mark.slow
    def test_truncations_raise(self, tmp_path):
        _, blob = make_stream(tmp_path)
        comp = ImprovedVideoCompressor(verbose=False)
        for cut in (3, 7, 9, len(blob) // 3, len(blob) - 2):
            p = str(tmp_path / f"cut{cut}.bfvc")
            with open(p, "wb") as f:
                f.write(blob[:cut])
            with pytest.raises(Exception):
                comp.decompress_video(p)

    @pytest.mark.parametrize("profile,cs", [
        ("blocked", "BGR"), ("bfv2", "BGR"), ("planar", "YUV")])
    @pytest.mark.slow
    def test_random_byte_corruption_never_hangs(self, tmp_path, profile,
                                                cs):
        """Flipping bytes either raises or yields frames — decode must
        terminate and stay structurally sane, in every stream profile."""
        frames, blob = make_stream(tmp_path, profile=profile,
                                   color_space=cs,
                                   use_direct_yuv=(cs == "YUV"))
        comp = ImprovedVideoCompressor(verbose=False)
        rng = np.random.default_rng(0)
        raised = survived = 0
        for trial in range(12):
            bad = bytearray(blob)
            # corrupt payload area, not the header
            for _ in range(3):
                pos = int(rng.integers(16, len(bad)))
                bad[pos] ^= int(rng.integers(1, 256))
            p = str(tmp_path / f"bad{trial}.bfvc")
            with open(p, "wb") as f:
                f.write(bytes(bad))
            try:
                out = comp.decompress_video(p)
                survived += 1
                for fr in out:
                    assert np.asarray(fr).dtype is not None
            except Exception:
                raised += 1
        assert raised + survived == 12

    @pytest.mark.parametrize("kind", ["pan_subpixel", "zoom"])
    @pytest.mark.slow
    def test_motion_wrapped_corruption_never_hangs(self, tmp_path, kind):
        """Random-byte fuzz over streams whose records include the
        motion-wrapped families — TILES_HP (17) / half-pel (9) /
        multi-ref (16) on the subpixel pan, parametric zoom (18) on the
        zoom clip (VERDICT r4 #7).  The stream composition is asserted
        first so the fuzz provably covers those parsers."""
        from new_bloom_filter_repo_tpu.utils.streaminfo import (
            attribute_stream)

        if kind == "pan_subpixel":
            frames = generate_frames(10, 256, 192, noise=0.5, seed=5,
                                     pan=0.6, pan_mode="subpixel")
            need = {"motion-tiles-halfpel"}
        else:
            frames = generate_frames(8, 128, 96, noise=1.0, seed=5,
                                     zoom=0.002)
            need = {"motion-zoom"}
        comp = ImprovedVideoCompressor(verbose=False,
                                       keyframe_interval=len(frames))
        p = str(tmp_path / "m.bfvc")
        comp.compress_video(frames, p)
        with open(p, "rb") as f:
            blob = f.read()
        _, payloads = container.parse_bfvc(blob)
        kinds = set(attribute_stream(payloads)["records"])
        assert need <= kinds, f"stream lacks {need - kinds}: {kinds}"

        rng = np.random.default_rng(1)
        raised = survived = 0
        for trial in range(12):
            bad = bytearray(blob)
            for _ in range(3):
                pos = int(rng.integers(16, len(bad)))
                bad[pos] ^= int(rng.integers(1, 256))
            pb = str(tmp_path / f"mb{trial}.bfvc")
            with open(pb, "wb") as f:
                f.write(bytes(bad))
            try:
                out = comp.decompress_video(pb)
                survived += 1
                for fr in out:
                    assert np.asarray(fr).dtype is not None
            except Exception:
                raised += 1
        assert raised + survived == 12

    def test_unknown_record_type_raises(self, tmp_path):
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "u.bfvc")
        container.write_bfvc(p, [b"\x1fweird"], container.MAGIC_BLOOM)
        with pytest.raises(ValueError, match="Unknown frame type"):
            comp.decompress_video(p)

    def test_interframe_before_keyframe_raises(self, tmp_path):
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "i.bfvc")
        container.write_bfvc(p, [b"\x02"], container.MAGIC_BLOOM)
        with pytest.raises(ValueError, match="before any keyframe"):
            comp.decompress_video(p)


class TestRawYUVFormats:
    @pytest.mark.parametrize("fmt,sub", [("I420", (2, 2)), ("YV12", (2, 2)),
                                         ("YUV422", (2, 1)),
                                         ("YUV444", (1, 1))])
    def test_read_raw_yuv_layouts(self, tmp_path, fmt, sub):
        rng = np.random.default_rng(1)
        w, h, n = 32, 16, 3
        sx, sy = sub
        cw, ch = w // sx, h // sy
        ys, us, vs = [], [], []
        p = str(tmp_path / "x.yuv")
        with open(p, "wb") as f:
            for _ in range(n):
                y = rng.integers(0, 256, (h, w), dtype=np.uint8)
                u = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
                v = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
                ys.append(y)
                us.append(u)
                vs.append(v)
                f.write(y.tobytes())
                if fmt == "YV12":
                    f.write(v.tobytes())
                    f.write(u.tobytes())
                else:
                    f.write(u.tobytes())
                    f.write(v.tobytes())
        frames = videoio.read_raw_yuv(p, w, h, fmt)
        assert len(frames) == n
        for i in range(n):
            np.testing.assert_array_equal(frames[i][:, :, 0], ys[i])
            np.testing.assert_array_equal(
                frames[i][::sy, ::sx, 1], us[i])
            np.testing.assert_array_equal(
                frames[i][::sy, ::sx, 2], vs[i])
