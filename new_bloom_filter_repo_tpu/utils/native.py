"""ctypes binding to the native host runtime (native/nbf.cpp).

Builds libnbf.so on first use (g++ via the bundled Makefile) and exposes
xxh64, batched index-table precompute, multi-threaded frame DEFLATE/
INFLATE, padded-row stream compaction, and the Y4M prober.  Every entry
point has a pure-Python fallback, so the framework works without a
toolchain; the native paths are the production fast paths for the host
stages (the TPU owns the compute path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import zlib
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnbf.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "libnbf.so"],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u64, u32, i32 = ctypes.c_uint64, ctypes.c_uint32, ctypes.c_int
        p8 = ctypes.POINTER(ctypes.c_uint8)
        pp8 = ctypes.POINTER(p8)
        pu64 = ctypes.POINTER(u64)
        pu32 = ctypes.POINTER(u32)
        lib.nbf_xxh64.restype = u64
        lib.nbf_xxh64.argtypes = [p8, u64, u64]
        lib.nbf_xxh64_index_table.restype = None
        lib.nbf_xxh64_index_table.argtypes = [u64, u64, u64, u64,
                                              pu64, pu64, pu64, i32]
        lib.nbf_deflate_frames.restype = i32
        lib.nbf_deflate_frames.argtypes = [i32, pp8, pu64, pp8, pu64,
                                           pu64, i32, i32]
        lib.nbf_inflate_frames.restype = i32
        lib.nbf_inflate_frames.argtypes = [i32, pp8, pu64, pp8, pu64,
                                           pu64, i32]
        lib.nbf_strip_rows.restype = u64
        lib.nbf_strip_rows.argtypes = [p8, u64, u64, pu32, p8]
        lib.nbf_pad_rows.restype = None
        lib.nbf_pad_rows.argtypes = [p8, u64, u64, pu32, p8]
        lib.nbf_y4m_probe.restype = i32
        lib.nbf_y4m_probe.argtypes = [p8, u64, pu32, pu32, pu32, pu32,
                                      pu32, pu32]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# ---------------------------------------------------------------------------
# xxh64
# ---------------------------------------------------------------------------

def xxh64(data: bytes, seed: int = 0) -> int:
    lib = load()
    if lib is None:
        from new_bloom_filter_repo_tpu.ops.xxh64 import xxh64 as py
        return py(data, seed)
    buf = np.frombuffer(data, dtype=np.uint8) if data else np.zeros(
        1, np.uint8)
    return int(lib.nbf_xxh64(_as_u8p(buf), len(data), seed))


def xxh64_index_tables(n: int, h1_seed: int, h2_seed: int, act_seed: int,
                       threads: int = 0):
    """(h1, h2, act) uint64[n] hashes of str(i) — host-side precompute."""
    lib = load()
    if lib is None:
        from new_bloom_filter_repo_tpu.ops.xxh64 import xxh64_int
        h1 = np.fromiter((xxh64_int(i, h1_seed) for i in range(n)),
                         np.uint64, n)
        h2 = np.fromiter((xxh64_int(i, h2_seed) for i in range(n)),
                         np.uint64, n)
        act = np.fromiter((xxh64_int(i, act_seed) for i in range(n)),
                          np.uint64, n)
        return h1, h2, act
    h1 = np.empty(n, np.uint64)
    h2 = np.empty(n, np.uint64)
    act = np.empty(n, np.uint64)
    threads = threads or (os.cpu_count() or 1)
    pu64 = ctypes.POINTER(ctypes.c_uint64)
    lib.nbf_xxh64_index_table(
        n, h1_seed, h2_seed, act_seed,
        h1.ctypes.data_as(pu64), h2.ctypes.data_as(pu64),
        act.ctypes.data_as(pu64), threads)
    return h1, h2, act


# ---------------------------------------------------------------------------
# Threaded frame zlib
# ---------------------------------------------------------------------------

def deflate_frames(buffers: Sequence[bytes], level: int = 6,
                   threads: int = 0) -> List[bytes]:
    """zlib-compress independent buffers, in parallel when native."""
    lib = load()
    if lib is None:
        return [zlib.compress(b, level) for b in buffers]
    count = len(buffers)
    if count == 0:
        return []
    threads = threads or (os.cpu_count() or 1)
    ins = [np.frombuffer(b, np.uint8) if b else np.zeros(1, np.uint8)
           for b in buffers]
    caps = [len(b) + (len(b) >> 9) + 64 for b in buffers]
    outs = [np.empty(c, np.uint8) for c in caps]
    p8 = ctypes.POINTER(ctypes.c_uint8)
    in_arr = (p8 * count)(*[_as_u8p(a) for a in ins])
    out_arr = (p8 * count)(*[_as_u8p(a) for a in outs])
    in_len = (ctypes.c_uint64 * count)(*[len(b) for b in buffers])
    out_cap = (ctypes.c_uint64 * count)(*caps)
    out_len = (ctypes.c_uint64 * count)()
    rc = lib.nbf_deflate_frames(count, in_arr, in_len, out_arr, out_cap,
                                out_len, level, threads)
    if rc != 0:
        return [zlib.compress(b, level) for b in buffers]
    return [outs[i][: out_len[i]].tobytes() for i in range(count)]


def inflate_frames(buffers: Sequence[bytes], sizes: Sequence[int],
                   threads: int = 0) -> List[bytes]:
    """zlib-decompress independent buffers with known raw sizes."""
    lib = load()
    if lib is None:
        return [zlib.decompress(b) for b in buffers]
    count = len(buffers)
    if count == 0:
        return []
    threads = threads or (os.cpu_count() or 1)
    ins = [np.frombuffer(b, np.uint8) if b else np.zeros(1, np.uint8)
           for b in buffers]
    outs = [np.empty(max(1, s), np.uint8) for s in sizes]
    p8 = ctypes.POINTER(ctypes.c_uint8)
    in_arr = (p8 * count)(*[_as_u8p(a) for a in ins])
    out_arr = (p8 * count)(*[_as_u8p(a) for a in outs])
    in_len = (ctypes.c_uint64 * count)(*[len(b) for b in buffers])
    out_cap = (ctypes.c_uint64 * count)(*[max(1, s) for s in sizes])
    out_len = (ctypes.c_uint64 * count)()
    rc = lib.nbf_inflate_frames(count, in_arr, in_len, out_arr, out_cap,
                                out_len, threads)
    if rc != 0:
        return [zlib.decompress(b) for b in buffers]
    return [outs[i][: out_len[i]].tobytes() for i in range(count)]


# ---------------------------------------------------------------------------
# Padded-row compaction
# ---------------------------------------------------------------------------

def strip_rows(arr2d: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenate arr2d[i, :lengths[i]] (native memcpy walk)."""
    lib = load()
    arr2d = np.ascontiguousarray(arr2d, np.uint8)
    lengths = np.ascontiguousarray(lengths, np.uint32)
    if lib is None:
        cols = np.arange(arr2d.shape[1])
        return arr2d[cols[None, :] < lengths[:, None]]
    total = int(lengths.sum())
    out = np.empty(total, np.uint8)
    lib.nbf_strip_rows(
        _as_u8p(arr2d), arr2d.shape[0], arr2d.shape[1],
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _as_u8p(out))
    return out


def pad_rows(stream: np.ndarray, rows: int, stride: int,
             lengths: np.ndarray) -> np.ndarray:
    """Inverse of strip_rows: (rows, stride) zero-padded."""
    lib = load()
    stream = np.ascontiguousarray(stream, np.uint8)
    lengths = np.ascontiguousarray(lengths, np.uint32)
    out = np.zeros((rows, stride), np.uint8)
    if lib is None:
        cols = np.arange(stride)
        out[cols[None, :] < lengths[:, None]] = stream[: int(lengths.sum())]
        return out
    lib.nbf_pad_rows(
        _as_u8p(stream), rows, stride,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _as_u8p(out))
    return out


# ---------------------------------------------------------------------------
# Y4M probe
# ---------------------------------------------------------------------------

def y4m_probe(data: bytes) -> Optional[dict]:
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(data[:4096], np.uint8)
    u32 = ctypes.c_uint32
    w, h, fn, fd, hl, cs = u32(), u32(), u32(), u32(), u32(), u32()
    rc = lib.nbf_y4m_probe(_as_u8p(buf), len(buf), ctypes.byref(w),
                           ctypes.byref(h), ctypes.byref(fn),
                           ctypes.byref(fd), ctypes.byref(hl),
                           ctypes.byref(cs))
    if rc != 0:
        return None
    return {"width": w.value, "height": h.value,
            "fps": (fn.value, fd.value), "header_len": hl.value,
            "colorspace": cs.value}
