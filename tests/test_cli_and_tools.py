"""CLI, verification harness, and image/text codec tests."""

import os

import numpy as np
import pytest

from new_bloom_filter_repo_tpu import cli
from new_bloom_filter_repo_tpu.models.image_text import BloomCompressor
from new_bloom_filter_repo_tpu.utils import videoio
from new_bloom_filter_repo_tpu.utils.synthetic import generate_frames
from new_bloom_filter_repo_tpu import verify_harness as vh

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def make_y4m(path, n=6, w=64, h=48):
    """Static textured scene + moving block (temporally correlated)."""
    rng = np.random.default_rng(0)
    y0 = rng.integers(16, 235, (h, w), dtype=np.uint8)
    u0 = rng.integers(16, 240, (h // 2, w // 2), dtype=np.uint8)
    v0 = rng.integers(16, 240, (h // 2, w // 2), dtype=np.uint8)
    planes = []
    for i in range(n):
        y = y0.copy()
        y[10:20, 4 + 4 * i:14 + 4 * i] = 200
        planes.append((y, u0.copy(), v0.copy()))
    videoio.write_y4m(path, planes, w, h, "420jpeg")
    return planes


class TestCLI:
    @pytest.mark.slow
    def test_synthetic_subcommand(self, tmp_path, capsys):
        rc = cli.main(["synthetic", str(tmp_path), "--frames", "6",
                       "--width", "64", "--height", "48",
                       "--keyframe-interval", "4"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Lossless: True" in out
        assert os.path.exists(str(tmp_path / "synthetic_compressed.bfvc"))

    @pytest.mark.slow
    def test_compress_decompress_y4m(self, tmp_path, capsys):
        y4m = str(tmp_path / "in.y4m")
        make_y4m(y4m)
        bfvc = str(tmp_path / "out.bfvc")
        rc = cli.main(["compress", y4m, bfvc, "--color-space", "YUV",
                       "--keyframe-interval", "4"])
        assert rc == 0 and os.path.exists(bfvc)
        assert "Compression Summary" in capsys.readouterr().out
        # decompress to mp4 requires cv2; verify via library instead
        from new_bloom_filter_repo_tpu.models.video import (
            ImprovedVideoCompressor)
        comp = ImprovedVideoCompressor(use_direct_yuv=True, verbose=False)
        frames = comp.extract_frames_from_video(y4m, output_color_space="YUV")
        rec = comp.decompress_video(bfvc)
        assert comp.verify_lossless(frames, rec)["lossless"]

    def test_process_yuv_subcommand(self, tmp_path, capsys):
        raw = str(tmp_path / "in.yuv")
        rng = np.random.default_rng(1)
        w, h, n = 64, 48, 4
        with open(raw, "wb") as f:
            for _ in range(n):
                f.write(rng.integers(0, 256, h * w, dtype=np.uint8).tobytes())
                f.write(rng.integers(0, 256, (h // 2) * (w // 2) * 2,
                                     dtype=np.uint8).tobytes())
        bfvc = str(tmp_path / "out.bfvc")
        rc = cli.main(["process-yuv", raw, bfvc, "--width", "64",
                       "--height", "48", "--format", "I420",
                       "--keyframe-interval", "2"])
        assert rc == 0 and os.path.exists(bfvc)
        assert "Processed 4 frames" in capsys.readouterr().out

    def test_analyze_subcommand(self, tmp_path, capsys):
        rc = cli.main(["analyze", str(tmp_path), "--frames", "4",
                       "--width", "64", "--height", "48",
                       "--noise-levels", "0.0", "2.0"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Noise Analysis Summary" in out
        assert "Tested 2 noise levels" in out

    def test_analyze_stream_subcommand(self, tmp_path, capsys):
        import json as _json

        import numpy as np
        from new_bloom_filter_repo_tpu.models.video import (
            ImprovedVideoCompressor)
        rng = np.random.default_rng(0)
        base = rng.integers(0, 220, (48, 64, 3), np.uint8)
        frames = []
        for i in range(6):
            f = base.copy()
            nm = rng.random((48, 64)) < 0.04
            f[nm] = rng.integers(0, 256, (int(nm.sum()), 3))
            frames.append(f)
        comp = ImprovedVideoCompressor(verbose=False)
        bfvc = str(tmp_path / "clip.bfvc")
        comp.compress_video(frames, bfvc)
        rc = cli.main(["analyze-stream", bfvc])
        out = capsys.readouterr().out
        assert rc == 0
        assert "record type" in out and "keyframe" in out
        rc = cli.main(["analyze-stream", bfvc, "--json"])
        info = _json.loads(capsys.readouterr().out)
        assert rc == 0
        assert info["total_bytes"] > 0
        assert sum(r["count"] for r in info["records"].values()) == 6
        assert abs(sum(r["share"] for r in info["records"].values())
                   - 1.0) < 0.01

    def test_no_action_prints_help(self, capsys):
        assert cli.main([]) == 0
        assert "compress" in capsys.readouterr().out


class TestVerifyHarness:
    def test_true_lossless_on_y4m(self, tmp_path):
        y4m = str(tmp_path / "v.y4m")
        make_y4m(y4m)
        res = vh.test_true_lossless(y4m, color_spaces=("YUV",),
                                    max_frames=4, verbose=False)
        assert res["all_passed"], res
        assert res["YUV"]["compression_ratio"] < 1.0

    def test_bit_exact_comparator_finds_diffs(self):
        frames = generate_frames(3, 32, 24, noise=0)
        bad = [f.copy() for f in frames]
        bad[1][3, 4, 0] ^= 5
        r = vh.verify_bit_exact(frames, bad)
        assert not r["bit_exact"]
        assert r["mismatched_frames"] == [1]
        ex = r["examples"][0]
        assert ex["frame"] == 1 and tuple(ex["pixel"])[:2] == (3, 4)

    def test_bit_exact_passes_on_identical(self):
        frames = generate_frames(2, 32, 24)
        r = vh.verify_bit_exact(frames, [f.copy() for f in frames])
        assert r["bit_exact"] and r["frames_compared"] == 2


class TestImageTextCodec:
    def test_text_roundtrip(self):
        c = BloomCompressor()
        text = ("the quick brown fox jumps over the lazy dog " * 20).strip()
        data, ratio = c.compress_text(text)
        assert c.decompress_text(data) == text

    def test_image_roundtrip(self, tmp_path):
        PIL = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(3)
        img = np.zeros((60, 80), np.uint8)
        img[10:30, 20:60] = 255
        img[rng.random((60, 80)) < 0.03] = 255  # sparse bright noise
        path = str(tmp_path / "img.png")
        PIL.fromarray(img).save(path)
        c = BloomCompressor()
        data, ratio = c.compress_image(path, threshold=127)
        out = c.decompress_image(data)
        np.testing.assert_array_equal(out, (img > 127).astype(np.uint8) * 255)

    def test_binary_roundtrip_densities(self):
        # reference self-test coverage: densities .1-.4 incl pass-through
        # (bloom_compress.py:621-658)
        c = BloomCompressor()
        rng = np.random.default_rng(4)
        for density in (0.1, 0.2, 0.3, 0.4):
            bits = (rng.random(4000) < density).astype(np.uint8)
            bitmap, witness, p, n, ratio = c.compress(bits)
            k, _ = c._calculate_optimal_params(n, p)
            out = c.decompress(bitmap, witness, n,
                               float(np.float32(k)))
            np.testing.assert_array_equal(out, bits)

    def test_network_byte_order_packing(self):
        c = BloomCompressor()
        data, _ = c.compress_text("hello world, format check")
        import struct
        # '!I' n field at offset 4 must be big-endian
        n = struct.unpack_from("!I", data, 4)[0]
        assert n == len("hello world, format check") * 8


class TestBloomCompressCrossParity:
    """Golden cross-parity with artifacts produced by running the actual
    reference bloom_compress implementation."""

    def test_decode_reference_text_blob(self):
        c = BloomCompressor()
        with open(os.path.join(FIXTURES, "golden_text.bcz"), "rb") as f:
            data = f.read()
        with open(os.path.join(FIXTURES, "golden_text.txt")) as f:
            want = f.read()
        assert c.decompress_text(data) == want

    def test_decode_reference_binary_blob(self):
        c = BloomCompressor()
        with open(os.path.join(FIXTURES, "golden_binary.bcz"), "rb") as f:
            data = f.read()
        bits = np.load(os.path.join(FIXTURES, "golden_binary_bits.npy"))
        bitmap, witness, p, n, k, shape = c._unpack_compressed_data(data)
        assert shape == (50, 60)
        out = c.decompress(bitmap, witness, n, k)
        np.testing.assert_array_equal(out, bits)

    def test_encode_matches_reference_bytes(self):
        """Our encoder reproduces the reference's packed bytes for the
        same input (float32-k quantization is byte-invisible here)."""
        c = BloomCompressor()
        bits = np.load(os.path.join(FIXTURES, "golden_binary_bits.npy"))
        bitmap, witness, p, n, _ = c.compress(bits)
        k, _l = c._calculate_optimal_params(n, p)
        ours = c._pack_compressed_data(bitmap, witness, p, n, k, (50, 60))
        with open(os.path.join(FIXTURES, "golden_binary.bcz"), "rb") as f:
            ref = f.read()
        assert ours == ref


def test_channel_forensics_breakdown():
    """verify_bit_exact reports per-channel diff stats (the reference's
    analyze_channel_differences, test_lossless.py:193-247)."""
    from new_bloom_filter_repo_tpu.verify_harness import (
        analyze_channel_differences,
        verify_bit_exact,
    )
    rng = np.random.default_rng(0)
    orig = [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)]
    bad = [orig[0].copy()]
    bad[0][2, 3, 1] += 10   # G channel
    bad[0][5, 5, 1] += 3
    bad[0][7, 1, 2] += 7    # R channel
    res = verify_bit_exact(orig, bad)
    assert not res["bit_exact"]
    ch = res["diff_stats"][0]["channels"]
    assert ch["B"]["pixels_different"] == 0
    assert ch["G"]["pixels_different"] == 2
    assert ch["R"]["pixels_different"] == 1
    assert ch["R"]["max_abs_diff"] == 7
    direct = analyze_channel_differences(orig[0], bad[0])
    assert direct == ch


def test_adversarial_synthetic_roundtrip(tmp_path):
    """Scene cuts + global pan produce dense masks and keyframe
    fallbacks, and the codec stays bit-exact on them."""
    from new_bloom_filter_repo_tpu.models.video import (
        ImprovedVideoCompressor,
        verify_lossless,
    )
    from new_bloom_filter_repo_tpu.utils.synthetic import generate_frames

    frames = generate_frames(12, 64, 48, noise=4.0, pan=3.0,
                             scene_cut_every=4, seed=3)
    comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=12)
    out = str(tmp_path / "adv.bfvc")
    res = comp.compress_video(frames, out)
    rec = comp.decompress_video(out)
    assert verify_lossless(frames, rec)["lossless"]
    # the cuts must have forced extra keyframes beyond the schedule
    assert res["keyframes"] > 1


def test_synthetic_y4m_suite(tmp_path):
    from new_bloom_filter_repo_tpu.utils.synthetic import (
        SUITE,
        generate_y4m_suite,
    )
    from new_bloom_filter_repo_tpu.utils.videoio import read_y4m

    paths = generate_y4m_suite(str(tmp_path), width=64, height=48,
                               frame_count=6)
    assert len(paths) == len(SUITE)
    frames, params = read_y4m(paths[0])
    assert len(frames) == 6
    assert params["width"] == 64 and params["height"] == 48


class TestBenchContract:
    """bench.py's JSON line is a driver artifact: its schema must not
    drift.  Heavy stages are stubbed; this checks wiring and keys."""

    def test_bench_json_schema(self, monkeypatch, capsys):
        import importlib
        import json as _json
        import sys as _sys
        _sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        bench = importlib.import_module("bench")
        monkeypatch.setattr(bench, "make_clip",
                            lambda *a, **k: [None] * 3)
        monkeypatch.setattr(bench, "_device_codec_fps",
                            lambda frames: (500.0, True, None))
        monkeypatch.setattr(
            bench, "_e2e_fps",
            lambda frames: (1.0, 1.0, 1.0, 0.25, 0.75, True))
        monkeypatch.setattr(
            bench, "_host_stage_seconds",
            lambda frames: (0.010, 0.004, {"enc_deflate": 7.0}))
        monkeypatch.setattr(
            bench, "_measured_production_fps",
            lambda frames, dev_dispatch=None: (71.4, 100.0, 250.0, True))
        import types
        monkeypatch.setitem(
            _sys.modules, "jax",
            types.SimpleNamespace(default_backend=lambda: "stub"))
        bench.main()
        out = _json.loads(capsys.readouterr().out)
        for key in ("metric", "value", "unit", "vs_baseline", "platform",
                    "lossless", "compression_ratio",
                    "transfer_bound_e2e_fps", "host_stage_fps",
                    "production_pipeline_fps", "production_encode_fps",
                    "production_decode_fps", "production_measured",
                    "host_stage_ms_per_frame"):
            assert key in out, key
        # 4K block (device codec + measured production pipeline): either
        # both numbers land or the note records why (never silently
        # absent)
        assert ("value_4k" in out), out.keys()
        if out["value_4k"] is not None:
            for key in ("lossless_4k", "production_pipeline_fps_4k",
                        "production_encode_fps_4k",
                        "production_decode_fps_4k",
                        "production_measured_4k"):
                assert key in out, key
        else:
            assert "note_4k" in out
        assert out["value"] == 500.0 and out["lossless"] is True
        # production numbers are MEASURED (overlapped loop), passed
        # through verbatim from _measured_production_fps
        assert out["production_pipeline_fps"] == 71.4
        assert out["production_encode_fps"] == 100.0
        assert out["production_measured"] is True
