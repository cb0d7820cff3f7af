"""The lossless binary-string Bloom codec (bitmap + witness).

API-parity re-design of the reference's ``BloomFilterCompressor``
(improved_video_compressor.py:140-307; duplicated at bloom_compress.py:13-
347 — implemented once here).  Encode: measure the ones-density p; if
p >= P* = 0.32453 pass the input through unchanged; otherwise build a
rational Bloom filter over the set-bit indices and emit (bitmap, witness)
where the witness holds the original bit of every index that passes the
membership test, in ascending index order.  Decode re-runs membership per
index: pass -> next witness bit, fail -> guaranteed 0.

The per-index hot loops run as the data-parallel device cores in
:mod:`new_bloom_filter_repo_tpu.ops.bloom_core`; this layer owns the
scalar parameter math (host float64, exactly like the reference's CPython
floats) and the density pass-through rules
(improved_video_compressor.py:211-225,281-284).

Deviation from the reference (documented, SURVEY.md §7 hard parts): k is
quantized to float32 *before* the filter is built, because the bitstream
stores float32 k (improved_video_compressor.py:938) and the decoder
rebuilds the filter from that value (:986).  The reference encodes with
float64 k and decodes with float32 k, which can desync the witness on
large frames; quantizing first makes encode/decode agree by construction
while remaining decodable by the reference's own decoder.
"""

from __future__ import annotations

import math

import numpy as np

from new_bloom_filter_repo_tpu.models.bloom import (
    P_STAR,
    activation_threshold_u64,
    optimal_compression_params,
)
from new_bloom_filter_repo_tpu.ops import bloom_core
from new_bloom_filter_repo_tpu.ops.hashtables import get_hash_tables

import jax.numpy as jnp


def _filter_scalars(k: float):
    """Host-side scalar prep: float32-quantized k -> (k32, floor_k, T)."""
    k32 = float(np.float32(k))
    floor_k = math.floor(k32)
    p_act = k32 - floor_k
    t = activation_threshold_u64(p_act)
    t = min(t, (1 << 64) - 1)  # p_act < 1 always, but clamp defensively
    return k32, floor_k, (np.uint32(t >> 32), np.uint32(t & 0xFFFFFFFF))


class BloomFilterCompressor:
    """Lossless Bloom-filter compression of binary arrays.

    ``seed_set`` picks the hash surface: ``"video"`` for the .bfvc frame
    codec (improved_video_compressor.py:62-63), ``"compress"`` for the
    standalone image/text codec (bloom_compress.py:159-196).
    """

    P_STAR = P_STAR

    def __init__(self, verbose: bool = False, seed_set: str = "video"):
        self.verbose = verbose
        self.seed_set = seed_set

    # Reference surface: improved_video_compressor.py:161-196
    def _calculate_optimal_params(self, n: int, p: float):
        return optimal_compression_params(n, p)

    def compress(self, binary_input):
        """Compress a 1D binary (0/1) array.

        Returns (bloom_bitmap, witness, density, input_length, ratio) with
        the reference's exact pass-through rules.  ``witness`` is a uint8
        array (the reference returns a Python list; this is duck-compatible
        for len()/iteration/np.array()).
        """
        binary_input = np.asarray(binary_input, dtype=np.uint8).ravel()
        n = int(binary_input.shape[0])
        ones = int(binary_input.sum())
        p = ones / n

        if p >= self.P_STAR:
            if self.verbose:
                print(f"Density {p:.4f} >= threshold {self.P_STAR}, "
                      "compression not effective")
            return binary_input, np.zeros(0, dtype=np.uint8), p, n, 1.0

        k, l = self._calculate_optimal_params(n, p)
        if l == 0 or l >= n:
            return binary_input, np.zeros(0, dtype=np.uint8), p, n, 1.0
        if l >= bloom_core.MAX_MODULUS:
            raise ValueError(f"filter length {l} exceeds supported maximum")

        k32, floor_k, (t_hi, t_lo) = _filter_scalars(k)
        tables = get_hash_tables(n, self.seed_set)
        l_pad = bloom_core.bitmap_pad(n)
        bit_array, _, witness, wlen = bloom_core.encode_core(
            jnp.asarray(binary_input),
            tables.h1, tables.h2, tables.act,
            jnp.uint32(l), jnp.uint32(t_hi), jnp.uint32(t_lo),
            floor_k=floor_k, l_pad=l_pad,
        )
        wlen = int(wlen)
        bitmap = np.asarray(bit_array)[:l]
        witness = np.asarray(witness)[:wlen]

        compressed_size = l + wlen
        ratio = compressed_size / n
        if self.verbose:
            print(f"Input length: {n}, Density: {p:.4f}")
            print(f"Optimal parameters: k={k:.4f}, l={l}")
            print(f"Bloom filter size: {l} bits")
            print(f"Witness size: {wlen} bits")
            print(f"Compression ratio: {ratio:.4f}")
        return bitmap, witness, p, n, ratio

    def decompress(self, bloom_bitmap, witness, n: int, k: float):
        """Inverse of :meth:`compress` from recorded values.

        ``k`` is the float32 value stored in the record; an empty witness
        means the bitmap *is* the original data (pass-through,
        improved_video_compressor.py:281-284).
        """
        if len(witness) == 0:
            return np.asarray(bloom_bitmap, dtype=np.uint8)

        bloom_bitmap = np.asarray(bloom_bitmap, dtype=np.uint8).ravel()
        l = int(bloom_bitmap.shape[0])
        n = int(n)
        _, floor_k, (t_hi, t_lo) = _filter_scalars(float(k))
        tables = get_hash_tables(n, self.seed_set)
        l_pad = bloom_core.bitmap_pad(n)
        if l > l_pad:  # foreign stream with an oversized filter: still valid
            l_pad = ((l + 127) // 128) * 128
        padded = np.zeros(l_pad, dtype=np.uint8)
        padded[:l] = bloom_bitmap
        wpad = np.zeros(n, dtype=np.uint8)
        w = np.asarray(witness, dtype=np.uint8).ravel()
        wpad[: w.shape[0]] = w

        out = bloom_core.decode_core(
            jnp.asarray(padded), jnp.asarray(wpad),
            tables.h1, tables.h2, tables.act,
            jnp.uint32(l), jnp.uint32(t_hi), jnp.uint32(t_lo),
            floor_k=floor_k,
        )
        return np.asarray(out, dtype=np.uint8)
