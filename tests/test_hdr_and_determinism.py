"""HDR/EXR pipeline and determinism-contract tests.

HDR (BASELINE config 4): EXR ingest via the first-party reader, float
frames through the codec, bit-pattern-exact verification (including NaN
and infinities — "lossless" for floats means bit equality, not numeric
closeness; SURVEY.md §7 hard parts).

Determinism (SURVEY.md §5): same input => byte-identical bitstream
across runs and across fresh compressor instances — the codec's
replacement for race detectors.
"""

import os
import struct
import zlib

import numpy as np
import pytest

from new_bloom_filter_repo_tpu.models.video import (
    ImprovedVideoCompressor,
    verify_lossless,
)
from new_bloom_filter_repo_tpu.utils import exr
from new_bloom_filter_repo_tpu.utils.synthetic import generate_frames


def hdr_frames(n=4, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    base = (rng.random((h, w, 3)) * 10.0).astype(np.float32)
    frames = []
    for i in range(n):
        f = base.copy()
        f[5:12, 4 + 3 * i:10 + 3 * i] = 123.456
        frames.append(f)
    # poison one frame with the awkward bit patterns
    if n > 1:
        frames[1][0, 0, 0] = np.nan
        frames[1][0, 1, 1] = np.inf
        frames[1][0, 2, 2] = -0.0
    return frames


class TestEXR:
    def test_float32_roundtrip_bit_exact(self, tmp_path):
        img = hdr_frames(1)[0]
        img[3, 3, 0] = np.nan
        p = str(tmp_path / "x.exr")
        exr.write_exr(p, img)
        back = exr.read_exr(p)
        assert back.dtype == np.float32
        assert back.tobytes() == img.tobytes()  # NaN-safe bit equality

    def test_half_roundtrip(self, tmp_path):
        img = (np.random.default_rng(1).random((10, 12)) * 4).astype(
            np.float16)
        p = str(tmp_path / "h.exr")
        exr.write_exr(p, img)
        back = exr.read_exr(p)
        assert back.dtype == np.float16
        assert back.tobytes() == img.tobytes()

    def test_rejects_non_exr(self, tmp_path):
        p = str(tmp_path / "bad.exr")
        with open(p, "wb") as f:
            f.write(b"garbage file")
        with pytest.raises(ValueError, match="not an EXR"):
            exr.read_exr(p)

    @pytest.mark.parametrize("compression", ["zip", "zips"])
    def test_zip_roundtrip_bit_exact(self, tmp_path, compression):
        """ZIP/ZIPS scanline compression (zlib + OpenEXR's interleave/
        delta pre-filter, ImfZip.cpp) — the common production setting
        the round-3 verdict flagged as missing."""
        img = hdr_frames(1, h=37, w=23)[0]   # h deliberately not /16
        img[3, 3, 0] = np.nan
        img[0, 0, 1] = np.inf
        p = str(tmp_path / f"{compression}.exr")
        exr.write_exr(p, img, compression=compression)
        back = exr.read_exr(p)
        assert back.dtype == np.float32
        assert back.tobytes() == img.tobytes()
        # smooth HDR content must actually shrink under zip
        smooth = np.linspace(0, 1, 64 * 48 * 3).astype(
            np.float32).reshape(64, 48, 3)
        pz = str(tmp_path / "smooth_zip.exr")
        pn = str(tmp_path / "smooth_none.exr")
        exr.write_exr(pz, smooth, compression=compression)
        exr.write_exr(pn, smooth, compression="none")
        # 16-line ZIP blocks amortize the zlib header/dict cost that
        # per-scanline ZIPS pays 16x as often.
        limit = 0.4 if compression == "zip" else 0.75
        assert os.path.getsize(pz) < limit * os.path.getsize(pn)
        assert exr.read_exr(pz).tobytes() == smooth.tobytes()

    def test_zip_half_and_incompressible(self, tmp_path):
        rng = np.random.default_rng(7)
        img = rng.random((18, 11), np.float32).astype(np.float16)
        p = str(tmp_path / "zh.exr")
        exr.write_exr(p, img, compression="zip")
        assert exr.read_exr(p).tobytes() == img.tobytes()
        # random bit patterns: zlib can't win, chunks store raw
        noisy = rng.integers(0, 2**32, (20, 13, 3),
                             dtype=np.uint32).view(np.float32)
        p2 = str(tmp_path / "noisy.exr")
        exr.write_exr(p2, noisy, compression="zips")
        assert exr.read_exr(p2).tobytes() == noisy.tobytes()

    def test_prefilter_inverse(self):
        rng = np.random.default_rng(3)
        for n in (1, 2, 3, 64, 1023):
            raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            assert exr._zip_postfilter(exr._zip_prefilter(raw)) == raw

    def test_piz_roundtrip_bit_exact(self, tmp_path):
        """PIZ (wavelet + Huffman, 32-scanline chunks) — the official
        library's default and the most common compression in production
        HDR files (VERDICT r4 #4).  HALF and FLOAT channels, NaN/Inf/
        denormal payloads, multi-block heights, odd dims."""
        rng = np.random.default_rng(11)
        # HALF RGB across 3 chunk blocks (h=70), with specials
        img = rng.normal(0, 8, (70, 23, 3)).astype(np.float16)
        img[0, 0, 0] = np.float16("nan")
        img[1, 2, 1] = np.float16("inf")
        img[2, 3, 2] = np.float16("-inf")
        img[3, 4, 0] = np.float16(6e-8)       # denormal
        p = str(tmp_path / "p.exr")
        exr.write_exr(p, img, compression="piz")
        back = exr.read_exr(p)
        assert back.dtype == np.float16
        assert back.tobytes() == img.tobytes()
        # FLOAT (two 16-bit planes per channel through the wavelet)
        f32 = rng.normal(0, 100, (37, 19)).astype(np.float32)
        f32[5, 5] = np.inf
        p2 = str(tmp_path / "pf.exr")
        exr.write_exr(p2, f32, compression="piz")
        assert exr.read_exr(p2).tobytes() == f32.tobytes()
        # smooth HDR content must actually shrink under PIZ
        smooth = np.linspace(0, 1, 64 * 48 * 3).astype(
            np.float16).reshape(64, 48, 3)
        pz = str(tmp_path / "s_piz.exr")
        pn = str(tmp_path / "s_none.exr")
        exr.write_exr(pz, smooth, compression="piz")
        exr.write_exr(pn, smooth, compression="none")
        assert os.path.getsize(pz) < 0.4 * os.path.getsize(pn)
        assert exr.read_exr(pz).tobytes() == smooth.tobytes()

    def test_piz_degenerate_and_w16(self, tmp_path):
        """Degenerate Huffman/bitmap paths (constant image: one symbol
        plus the run-length pseudo-symbol; all-zeros: empty bitmap;
        single pixel/row) and the 16-bit wavelet mode (more than 2^14
        distinct values after LUT compaction)."""
        p = str(tmp_path / "d.exr")
        for img in (np.full((40, 40, 3), 1.5, np.float16),
                    np.zeros((32, 32), np.float32),
                    np.array([[2.25]], np.float32),
                    np.arange(77, dtype=np.float16).reshape(1, 77)):
            exr.write_exr(p, img, compression="piz")
            assert exr.read_exr(p).tobytes() == img.tobytes()
        # w16 mode: 36000 distinct 16-bit patterns -> maxValue > 2^14
        bits = (np.arange(36000, dtype=np.uint32) % 60000).astype(
            np.uint16)
        img = bits.reshape(180, 200).view(np.float16)
        exr.write_exr(p, img, compression="piz")
        assert exr.read_exr(p).tobytes() == img.tobytes()

    def test_piz_golden_fixture(self):
        """Byte-pinned PIZ fixture: guards the on-disk format against
        drift in either direction (reader decodes the checked-in bytes;
        writer reproduces them exactly).  An official-library cross
        fixture is environment-gated on this rig (no egress, no
        OpenEXR wheel) — recorded in RESULTS.md."""
        fix = os.path.join(os.path.dirname(__file__), "fixtures",
                           "golden_piz.exr")
        expect = np.load(os.path.join(os.path.dirname(__file__),
                                      "fixtures",
                                      "golden_piz_expect.npy"))
        back = exr.read_exr(fix)
        assert np.array_equal(back.view(np.uint16), expect)
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "re.exr")
            exr.write_exr(p, expect.view(np.float16), compression="piz")
            with open(p, "rb") as f1, open(fix, "rb") as f2:
                assert f1.read() == f2.read()

    def test_rle_roundtrip_bit_exact(self, tmp_path):
        """RLE (code 1): the ZIP pre-filter + OpenEXR's signed-count
        byte RLE, one scanline per chunk — completes the lossless
        scanline compression set (NONE/RLE/ZIPS/ZIP/PIZ)."""
        rng = np.random.default_rng(4)
        p = str(tmp_path / "r.exr")
        for img in (np.linspace(0, 2, 37 * 23 * 3).astype(
                        np.float16).reshape(37, 23, 3),
                    rng.normal(0, 1, (18, 11)).astype(np.float32),
                    np.full((9, 300), 1.25, np.float16)):
            exr.write_exr(p, img, compression="rle")
            assert exr.read_exr(p).tobytes() == img.tobytes()
        # token-grammar fuzz (independent of the file framing)
        for n in (0, 1, 2, 3, 130, 1000):
            raw = rng.integers(0, 4, n, np.uint8).tobytes()
            assert exr._rle_uncompress(exr._rle_compress(raw),
                                       n) == raw
        with pytest.raises(ValueError):
            exr._rle_uncompress(b"\x7f", 5)   # truncated repeat
        with pytest.raises(ValueError):
            exr._rle_uncompress(bytes([250, 1, 2]), 16)  # short literal

    def test_piz_huffman_native_matches_python(self):
        """The C++ PIZ Huffman decoder (nbf_huf_decode) and the pure
        Python decoder must agree bit-for-bit on the same stream —
        the native path serves reads when libnbf is built, so the
        Python path needs an explicit cross-check to stay honest."""
        from new_bloom_filter_repo_tpu.utils import native
        rng = np.random.default_rng(9)
        for n, hi in ((1, 2), (100, 7), (5000, 300), (40000, 61000)):
            data = rng.integers(0, hi, n).astype(np.uint16)
            if n > 10:
                data[10:] = data[9]  # long run exercises the rlc path
            blob = exr._huf_compress(data)
            im, iM, _tl, n_bits, _ = struct.unpack_from("<IIIII", blob,
                                                        0)
            lengths, off = exr._huf_unpack_table(blob, 20, im, iM)
            codes = exr._huf_canonical_codes(lengths)
            py = exr._huf_decode(blob[off:], n_bits, codes, lengths,
                                 iM, n)
            assert np.array_equal(py, data)
            nat = native.huf_decode(blob[off:], n_bits, lengths, codes,
                                    iM, n)
            if nat is not None:          # native build present
                assert np.array_equal(nat, data)

    def test_piz_rejects_corrupt_chunks(self, tmp_path):
        """Corrupt PIZ payloads raise instead of hanging or decoding
        wrong (SURVEY §5 failure-detection row)."""
        img = np.linspace(0, 5, 33 * 21).astype(np.float16).reshape(
            33, 21)
        p = str(tmp_path / "c.exr")
        exr.write_exr(p, img, compression="piz")
        with open(p, "rb") as f:
            data = bytearray(f.read())
        rng = np.random.default_rng(5)
        hdr_end = len(data) - 200
        for _ in range(12):
            mut = bytearray(data)
            i = int(rng.integers(hdr_end, len(data)))
            mut[i] ^= 0xFF
            with open(p, "wb") as f:
                f.write(mut)
            try:
                back = exr.read_exr(p)
                assert back.shape == img.shape  # decoded: shape sane
            except (ValueError, struct.error, zlib.error):
                pass  # typed failure is the contract


class TestHDRPipeline:
    @pytest.mark.parametrize("compression", ["none", "piz"])
    def test_hdr_clip_lossless(self, tmp_path, compression):
        frames = hdr_frames(4)
        # write an EXR sequence (incl. PIZ, the production default) and
        # ingest through the public API
        d = tmp_path / "seq"
        d.mkdir()
        for i, f in enumerate(frames):
            exr.write_exr(str(d / f"frame{i:03d}.exr"), f,
                          compression=compression)
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=2)
        loaded = comp.extract_frames_from_video(str(d))
        assert len(loaded) == 4
        for a, b in zip(loaded, frames):
            assert a.tobytes() == b.tobytes()
        out = str(tmp_path / "hdr.bfvc")
        res = comp.compress_video(loaded, out)
        rec = comp.decompress_video(out)
        v = comp.verify_lossless(loaded, rec)
        assert v["lossless"], v
        assert np.asarray(rec[1]).dtype == np.float32

    def test_verify_lossless_nan_bit_equality(self):
        f = hdr_frames(2)
        same = [x.copy() for x in f]
        assert verify_lossless(f, same)["lossless"]
        # flipped NaN payload bit must FAIL (bit-pattern semantics)
        bad = [x.copy() for x in f]
        v = bad[1].view(np.uint32)
        v[0, 0, 0] ^= 1
        assert not verify_lossless(f, bad)["lossless"]


class TestDeterminism:
    def test_bitstream_identical_across_runs(self, tmp_path):
        frames = generate_frames(8, 64, 48, noise=2.0, seed=5)
        paths = []
        for run in range(2):
            comp = ImprovedVideoCompressor(verbose=False,
                                           keyframe_interval=4)
            p = str(tmp_path / f"run{run}.bfvc")
            comp.compress_video(frames, p)
            paths.append(p)
        with open(paths[0], "rb") as a, open(paths[1], "rb") as b:
            assert a.read() == b.read()

    def test_keyframe_mode_deterministic(self, tmp_path):
        frames = generate_frames(4, 48, 32, noise=1.0, seed=9)
        blobs = []
        for run in range(2):
            comp = ImprovedVideoCompressor(verbose=False, mode="keyframe")
            p = str(tmp_path / f"k{run}.bfvc")
            comp.compress_video(frames, p)
            with open(p, "rb") as f:
                blobs.append(f.read())
        assert blobs[0] == blobs[1]


class TestByteDomainInterCoding:
    """Non-uint8 clips inter-code in the byte domain (bit-pattern exact;
    the reference's HDR support is only a dtype decode rule)."""

    def _roundtrip(self, frames, tmp_path, name):
        from new_bloom_filter_repo_tpu.models import frame_codec as fc
        from new_bloom_filter_repo_tpu.utils import container
        comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=6)
        path = str(tmp_path / name)
        res = comp.compress_video(frames, path)
        _, payloads = container.read_bfvc(path)
        types = [fc.record_type(p) for p in payloads]
        rec = comp.decompress_video(path)
        assert len(rec) == len(frames)
        for a, b in zip(frames, rec):
            assert a.dtype == b.dtype and a.shape == b.shape
            assert a.tobytes() == b.tobytes()
        return res, types

    @pytest.mark.slow
    def test_float32_hdr_clip_inter_codes(self, tmp_path):
        rng = np.random.default_rng(0)
        base = rng.random((24, 64, 3), dtype=np.float32) * 100
        base[3, 5, 1] = np.nan  # NaN payload must survive bit-exactly
        frames = []
        for i in range(8):
            f = base.copy()
            f[10:14, 2 + 3 * i: 8 + 3 * i] = 7.5 + i
            frames.append(f)
        res, types = self._roundtrip(frames, tmp_path, "hdr.bfvc")
        from new_bloom_filter_repo_tpu.models import frame_codec as fc
        assert types[0] == fc.KEYFRAME
        assert any(t in (fc.BLOCKED, fc.BLOCKED_Z, fc.SPARSE,
                         fc.INTERFRAME) for t in types[1:]), types
        # inter coding must beat all-keyframes on static float content
        key = ImprovedVideoCompressor(verbose=False, mode="keyframe")
        rk = key.compress_video(frames, str(tmp_path / "k.bfvc"))
        assert res["compressed_size"] < rk["compressed_size"]

    def test_uint16_clip_inter_codes(self, tmp_path):
        rng = np.random.default_rng(1)
        base = rng.integers(0, 1 << 16, (32, 48), dtype=np.uint16)
        frames = []
        for i in range(6):
            f = base.copy()
            f[4:8, 4 + 2 * i: 10 + 2 * i] = 40000 + i
            frames.append(f)
        self._roundtrip(frames, tmp_path, "u16.bfvc")

    @pytest.mark.slow
    def test_bgra_clip_inter_codes(self, tmp_path):
        rng = np.random.default_rng(2)
        base = rng.integers(0, 255, (24, 40, 4), dtype=np.uint8)
        frames = []
        for i in range(6):
            f = base.copy()
            f[6:12, 3 * i: 3 * i + 6] = (9, 8, 7, 255)
            frames.append(f)
        self._roundtrip(frames, tmp_path, "bgra.bfvc")
