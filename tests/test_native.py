"""Native host runtime tests (C++ libnbf via ctypes).

Skipped gracefully when the toolchain is unavailable; the Python
fallbacks are exercised either way through the rest of the suite."""

import zlib

import numpy as np
import pytest

from new_bloom_filter_repo_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")
xxhash = pytest.importorskip("xxhash")


def test_xxh64_matches_c_library():
    rng = np.random.default_rng(0)
    for n in (0, 1, 3, 7, 8, 31, 32, 100, 5000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for seed in (0, 999, 0x12345678):
            assert native.xxh64(data, seed) == xxhash.xxh64_intdigest(
                data, seed)


def test_index_tables_match_reference_probes():
    n = 2000
    h1, h2, act = native.xxh64_index_tables(n, 0x12345678, 0x87654321, 999)
    for i in (0, 1, 9, 10, 777, 1999):
        assert int(h1[i]) == xxhash.xxh64_intdigest(str(i), 0x12345678)
        assert int(h2[i]) == xxhash.xxh64_intdigest(str(i), 0x87654321)
        assert int(act[i]) == xxhash.xxh64_intdigest(str(i), 999)


def test_index_tables_match_device_tables():
    """The native precompute equals the on-device vectorized xxh64."""
    from new_bloom_filter_repo_tpu.ops.hashtables import get_hash_tables
    n = 4096
    t = get_hash_tables(n, "video")
    dev_h1 = (np.asarray(t.h1[0], np.uint64) << np.uint64(32)) | np.asarray(
        t.h1[1], np.uint64)
    h1, _, _ = native.xxh64_index_tables(n, 0x12345678, 0x87654321, 999)
    np.testing.assert_array_equal(h1, dev_h1)


def test_threaded_deflate_inflate_roundtrip():
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 30, rng.integers(1000, 60000),
                           dtype=np.uint8).tobytes() for _ in range(9)]
    comp = native.deflate_frames(frames, level=6, threads=4)
    # DEFLATE streams are valid for the stock zlib decoder
    assert all(zlib.decompress(c) == f for c, f in zip(comp, frames))
    back = native.inflate_frames(comp, [len(f) for f in frames], threads=4)
    assert back == list(frames)


def test_strip_and_pad_rows_roundtrip():
    rng = np.random.default_rng(2)
    rows, stride = 50, 128
    lengths = rng.integers(0, stride + 1, rows).astype(np.uint32)
    arr = np.zeros((rows, stride), np.uint8)
    for r in range(rows):
        arr[r, : lengths[r]] = rng.integers(1, 255, lengths[r])
    stream = native.strip_rows(arr, lengths)
    assert stream.size == lengths.sum()
    back = native.pad_rows(stream, rows, stride, lengths)
    np.testing.assert_array_equal(back, arr)


def test_y4m_probe():
    hdr = b"YUV4MPEG2 W352 H288 F30000:1001 Ip A128:117 C420jpeg\nFRAME\n"
    info = native.y4m_probe(hdr + b"\x00" * 64)
    assert info == {"width": 352, "height": 288, "fps": (30000, 1001),
                    "header_len": 53, "colorspace": 420}
    assert native.y4m_probe(b"not a y4m file") is None


class TestSubfilterPack:
    """Native bitmap splice vs the numpy expanded-bit path."""

    def _numpy_pack(self, words, m):
        nb, nw = words.shape
        u = words.astype(np.uint32)
        by = np.stack([(u >> 24) & 0xFF, (u >> 16) & 0xFF,
                       (u >> 8) & 0xFF, u & 0xFF], axis=-1).astype(np.uint8)
        bits = np.unpackbits(by.reshape(nb, -1), axis=1)[:, :m]
        return np.packbits(bits.reshape(-1))

    @pytest.mark.parametrize("nb,m,nw", [(8, 16, 4), (25, 37, 4),
                                         (64, 128, 4), (31, 384, 12),
                                         (16, 33, 8), (5, 100, 4)])
    def test_pack_matches_numpy_and_roundtrips(self, nb, m, nw):
        rng = np.random.default_rng(nb * m)
        words = rng.integers(-2**31, 2**31, (nb, nw), np.int64)
        words = words.astype(np.int32)
        # zero tail bits past m inside each block (the kernel invariant)
        u = words.view(np.uint32).reshape(nb, nw)
        for j in range(m, nw * 32):
            u[:, j // 32] &= ~np.uint32(1 << (31 - (j % 32)))
        packed = native.pack_subfilters(words, m)
        np.testing.assert_array_equal(packed, self._numpy_pack(words, m))
        back = native.unpack_subfilters(packed, nb, m, nw)
        np.testing.assert_array_equal(back, words)

    def test_rejects_oversized_m(self):
        with pytest.raises(ValueError):
            native.pack_subfilters(np.zeros((4, 4), np.int32), 200)


class TestRansCoder:
    """Static binary rANS section coder: native <-> Python-fallback
    interop, round-trips, and malformed-stream rejection."""

    @pytest.mark.parametrize("p1", [0.03, 0.15, 0.78, 0.9, 0.99])
    def test_roundtrip_biased_bits(self, p1):
        rng = np.random.default_rng(int(p1 * 100))
        bits = (rng.random(4096 * 8) < p1).astype(np.uint8)
        data = np.packbits(bits).tobytes()
        prob = native.rans_bit_prob(data)
        enc = native.rans_encode(data, prob)
        assert enc is not None
        dec = native.rans_decode(enc, prob, len(data))
        assert dec == data
        # near-entropy: within 6% of H(p) + table quantization slack
        import math
        h = -(p1 * math.log2(p1) + (1 - p1) * math.log2(1 - p1))
        assert len(enc) <= len(data) * max(h + 0.06, 0.02) + 16

    def test_python_fallback_interops_with_native(self, monkeypatch):
        if native.load() is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(7)
        data = np.packbits(
            (rng.random(8192) < 0.82).astype(np.uint8)).tobytes()
        prob = native.rans_bit_prob(data)
        enc_native = native.rans_encode(data, prob)
        monkeypatch.setattr(native, "load", lambda: None)
        enc_py = native.rans_encode(data, prob)
        assert enc_py == enc_native           # bit-identical streams
        assert native.rans_decode(enc_native, prob, len(data)) == data

    def test_malformed_stream_raises(self):
        with pytest.raises(ValueError):
            native.rans_decode(b"\x01\x02", 200, 100)
        # truncated body starves the renorm loop
        rng = np.random.default_rng(1)
        data = np.packbits((rng.random(8192) < 0.8).astype(np.uint8)
                           ).tobytes()
        enc = native.rans_encode(data, 205)
        with pytest.raises(ValueError):
            native.rans_decode(enc[: len(enc) // 2], 205, len(data))

    def test_empty_input(self):
        enc = native.rans_encode(b"", 128)
        assert native.rans_decode(enc, 128, 0) == b""


class TestEntropyGates:
    """byte_hist / popcount_bytes and the DEFLATE-unwinnable gate
    (models/blocked_pipeline._deflate_unwinnable)."""

    def test_hist_and_popcount_match_numpy(self):
        rng = np.random.default_rng(7)
        for n in (0, 1, 7, 4096, 100001):
            d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            ref = np.bincount(np.frombuffer(d, np.uint8), minlength=256)
            assert (native.byte_hist(d) == ref).all()
            assert native.popcount_bytes(d) == int(
                np.unpackbits(np.frombuffer(d, np.uint8)).sum())

    def test_gate_skips_uniform_and_iid_bits_keeps_structure(self):
        from new_bloom_filter_repo_tpu.models.blocked_pipeline import (
            _deflate_unwinnable)
        rng = np.random.default_rng(11)
        uniform = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
        assert _deflate_unwinnable(uniform, bits=False)
        # iid bits at the sub-filter density: nothing beyond the bit
        # bias for LZ/Huffman to exploit -> skip
        iid = np.packbits(rng.random(8 * 65536) < 0.32).tobytes()
        assert _deflate_unwinnable(iid, bits=True)
        # clustered mask (long zero runs) -> DEFLATE genuinely wins
        mask = np.zeros(8 * 65536, np.uint8)
        for s in range(0, mask.size, 4096):
            mask[s:s + 1310] = 1  # same global density, run-structured
        runs = np.packbits(mask).tobytes()
        assert not _deflate_unwinnable(runs, bits=True)
        # low-density sections keep DEFLATE regardless (rANS table
        # overhead dominates; run coding is near-free)
        sparse = np.packbits(rng.random(8 * 65536) < 0.004).tobytes()
        assert not _deflate_unwinnable(sparse, bits=True)
        # small sections always keep the trial
        assert not _deflate_unwinnable(uniform[:1024], bits=False)

    def test_gate_decisions_reach_the_stream(self):
        """A blocked frame's sub-filter bitmap section must decode
        identically whether or not its DEFLATE trial was skipped."""
        from new_bloom_filter_repo_tpu.models import blocked_pipeline as bp
        rng = np.random.default_rng(3)
        base = rng.integers(0, 220, (48, 64, 3), np.uint8)
        frames = []
        for i in range(4):
            f = base.copy()
            nm = rng.random((48, 64)) < 0.04
            f[nm] = rng.integers(0, 256, (int(nm.sum()), 3))
            frames.append(f)
        enc = bp.BlockedEncoder()
        recs = []
        enc.encode_chunk(base, frames, recs)
        dec = bp.BlockedDecoder()
        out = dec.decode_run(base, recs)
        for a, b in zip(frames, out):
            np.testing.assert_array_equal(a, np.asarray(b))


class TestRans2Coder:
    """2D-context byte rANS (section coding 6)."""

    def _plane(self, seed=0, h=96, w=130):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        return ((8 * np.sin(yy / 7) * np.cos(xx / 9))
                + rng.normal(0, 3, (h, w))).astype(np.int16).astype(
                    np.uint8)

    def test_roundtrip_and_fallback_bit_identity(self, monkeypatch):
        plane = self._plane()
        data, w = plane.tobytes(), plane.shape[1]
        enc = native.rans2_encode(data, w)
        assert enc is not None
        assert native.rans2_decode(enc, w, len(data)) == data
        monkeypatch.setattr(native, "load", lambda: None)
        assert native.rans2_encode(data, w) == enc
        assert native.rans2_decode(enc, w, len(data)) == data

    def test_beats_order1_on_2d_correlated_residuals(self):
        plane = self._plane(seed=3, h=160, w=200)
        data, w = plane.tobytes(), plane.shape[1]
        e2 = native.rans2_encode(data, w)
        ec = native.ransc_encode(data)
        assert e2 is not None and ec is not None
        assert len(e2) < len(ec)

    def test_malformed_and_edge_inputs(self):
        with pytest.raises(ValueError):
            native.rans2_decode(b"\x00" * 10, 16, 100)
        plane = self._plane(seed=1)
        data, w = plane.tobytes(), plane.shape[1]
        enc = native.rans2_encode(data, w)
        with pytest.raises(ValueError):
            native.rans2_decode(enc[: len(enc) // 2], w, len(data))
        with pytest.raises(ValueError):
            native.rans2_decode(enc, 0, len(data))
        assert native.rans2_encode(b"", 16) is None

    def test_pooled_trials_match_serial(self):
        plane = self._plane(seed=2)
        data, w = plane.tobytes(), plane.shape[1]
        serial = [native.rans8_encode(data), native.ransc_encode(data),
                  native.rans2_encode(data, w)]
        pooled = native.rans_trials([data] * 3, [3, 4, 6],
                                    strides=[0, 0, w])
        assert pooled == serial


class TestBitpackWitness:
    """Coding-7 witness sections: per-block byte padding stripped,
    binary rANS over the pure bit stream (nbf_bitpack_rows)."""

    def test_pack_roundtrip_and_fallback(self, monkeypatch):
        rng = np.random.default_rng(5)
        nrows, stride = 300, 16
        bits = rng.integers(0, stride * 8 + 1, nrows).astype(np.int32)
        rows = np.zeros((nrows, stride), np.uint8)
        for r in range(nrows):
            nb = int(bits[r])
            if nb:
                raw = np.packbits((rng.random(nb) < 0.8).astype(
                    np.uint8))
                rows[r, :len(raw)] = raw
                if nb % 8:
                    rows[r, (nb - 1) // 8] &= (0xFF << (8 - nb % 8)) & 0xFF
        packed = native.bitpack_rows(rows, bits)
        assert len(packed) == (int(bits.sum()) + 7) // 8
        back = native.bitunpack_rows(packed, nrows, stride, bits)
        np.testing.assert_array_equal(back, rows)
        monkeypatch.setattr(native, "load", lambda: None)
        assert native.bitpack_rows(rows, bits) == packed
        np.testing.assert_array_equal(
            native.bitunpack_rows(packed, nrows, stride, bits), rows)

    def test_short_stream_and_bad_lengths_raise(self):
        bits = np.full(4, 16, np.int32)
        rows = np.full((4, 4), 0xAA, np.uint8)
        packed = native.bitpack_rows(rows, bits)
        with pytest.raises(ValueError):
            native.bitunpack_rows(packed[:2], 4, 4, bits)
        with pytest.raises(ValueError):
            native.bitpack_rows(rows, np.full(4, 99, np.int32))

    def test_coding7_stream_roundtrip(self, tmp_path):
        """A blocked stream whose witness sections chose coding 7 must
        decode bit-exactly, and the analyze-stream walker must see the
        coding."""
        from new_bloom_filter_repo_tpu.models.video import (
            ImprovedVideoCompressor)
        from new_bloom_filter_repo_tpu.utils import container, streaminfo
        rng = np.random.default_rng(2)
        base = rng.integers(0, 220, (64, 96, 3), np.uint8)
        frames = []
        for i in range(8):
            f = base.copy()
            nm = rng.random((64, 96)) < 0.03
            f[nm] = rng.integers(0, 256, (int(nm.sum()), 3))
            frames.append(f)
        comp = ImprovedVideoCompressor(verbose=False)
        p = str(tmp_path / "w7.bfvc")
        comp.compress_video(frames, p)
        rec = comp.decompress_video(p)
        assert comp.verify_lossless(frames, rec)["lossless"]
        _, payloads = container.read_bfvc(p)
        info = streaminfo.attribute_stream(payloads)
        assert "bitpacked-rans" in info["section_codings"], (
            info["section_codings"])
