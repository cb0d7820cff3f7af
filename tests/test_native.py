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
