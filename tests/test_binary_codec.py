"""Round-trip and reference-semantics parity tests for the binary codec.

The oracle below is an independent, loopy transcription of the reference
algorithm's observable semantics (improved_video_compressor.py:198-307)
built directly on the C xxhash wheel, with the same float32-k quantization
rule the framework uses.  The device codec must match it bit for bit:
same bitmap, same witness, same decode.
"""

import math

import numpy as np
import pytest

from new_bloom_filter_repo_tpu.models.binary_codec import BloomFilterCompressor
from new_bloom_filter_repo_tpu.models.bloom import (
    P_STAR,
    activation_threshold_u64,
    optimal_compression_params,
)

xxhash = pytest.importorskip("xxhash")

SEEDS = {"video": (0x12345678, 0x87654321, 999), "compress": (0, 1, 999)}


def oracle_encode(bits, seed_set="video"):
    """Loopy reference-semantics encoder (float32-quantized k)."""
    n = len(bits)
    p = int(bits.sum()) / n
    if p >= P_STAR:
        return bits, np.zeros(0, np.uint8), p, n, None, None
    k, l = optimal_compression_params(n, p)
    if l == 0 or l >= n:
        return bits, np.zeros(0, np.uint8), p, n, None, None
    h1s, h2s, acts = SEEDS[seed_set]
    k32 = float(np.float32(k))
    floor_k = math.floor(k32)
    thr = activation_threshold_u64(k32 - floor_k)
    bit_array = np.zeros(l, dtype=np.uint8)
    h1 = [xxhash.xxh64_intdigest(str(i), h1s) for i in range(n)]
    h2 = [xxhash.xxh64_intdigest(str(i), h2s) for i in range(n)]
    act = [xxhash.xxh64_intdigest(str(i), acts) < thr for i in range(n)]
    for i in range(n):
        if bits[i]:
            lanes = floor_k + (1 if act[i] else 0)
            for j in range(lanes):
                bit_array[(h1[i] + j * h2[i]) % l] = 1
    witness = []
    for i in range(n):
        lanes = floor_k + (1 if act[i] else 0)
        if all(bit_array[(h1[i] + j * h2[i]) % l] for j in range(lanes)):
            witness.append(bits[i])
    return bit_array, np.array(witness, np.uint8), p, n, k32, l


def oracle_decode(bitmap, witness, n, k, seed_set="video"):
    if len(witness) == 0:
        return np.asarray(bitmap, np.uint8)
    l = len(bitmap)
    h1s, h2s, acts = SEEDS[seed_set]
    k32 = float(np.float32(k))
    floor_k = math.floor(k32)
    thr = activation_threshold_u64(k32 - floor_k)
    out = np.zeros(n, np.uint8)
    wi = 0
    for i in range(n):
        h1 = xxhash.xxh64_intdigest(str(i), h1s)
        h2 = xxhash.xxh64_intdigest(str(i), h2s)
        lanes = floor_k + (1 if xxhash.xxh64_intdigest(str(i), acts) < thr else 0)
        if all(bitmap[(h1 + j * h2) % l] for j in range(lanes)):
            out[i] = witness[wi]
            wi += 1
    return out


def make_bits(n, density, seed):
    rng = np.random.default_rng(seed)
    return (rng.random(n) < density).astype(np.uint8)


@pytest.mark.parametrize("density", [0.02, 0.1, 0.2, 0.3])
def test_roundtrip_lossless(density):
    c = BloomFilterCompressor()
    bits = make_bits(5000, density, seed=int(density * 100))
    bitmap, witness, p, n, ratio = c.compress(bits)
    k, _ = c._calculate_optimal_params(n, p)
    out = c.decompress(bitmap, witness, n, float(np.float32(k)))
    np.testing.assert_array_equal(out, bits)
    if density <= 0.2:
        assert ratio < 1.0


def test_passthrough_above_threshold():
    c = BloomFilterCompressor()
    bits = make_bits(4000, 0.45, seed=9)
    bitmap, witness, p, n, ratio = c.compress(bits)
    assert len(witness) == 0 and ratio == 1.0
    np.testing.assert_array_equal(bitmap, bits)
    np.testing.assert_array_equal(c.decompress(bitmap, witness, n, 0.0), bits)


def test_passthrough_all_zeros():
    c = BloomFilterCompressor()
    bits = np.zeros(3000, dtype=np.uint8)
    bitmap, witness, p, n, ratio = c.compress(bits)
    assert p == 0.0 and len(witness) == 0
    np.testing.assert_array_equal(c.decompress(bitmap, witness, n, 0.0), bits)


@pytest.mark.parametrize("seed_set", ["video", "compress"])
@pytest.mark.parametrize("density", [0.05, 0.15, 0.28])
def test_bitstream_parity_with_oracle(seed_set, density):
    n = 1200
    bits = make_bits(n, density, seed=7)
    c = BloomFilterCompressor(seed_set=seed_set)
    bitmap, witness, p, _, _ = c.compress(bits)
    obitmap, owitness, op, _, k32, l = oracle_encode(bits, seed_set)
    assert p == op
    np.testing.assert_array_equal(bitmap, obitmap)
    np.testing.assert_array_equal(witness, owitness)
    # Cross-decode both directions.
    np.testing.assert_array_equal(
        c.decompress(obitmap, owitness, n, k32), bits)
    np.testing.assert_array_equal(
        oracle_decode(bitmap, witness, n, k32, seed_set), bits)


def test_low_density_tiny_k():
    # Density low enough that k is large and l small relative to n.
    c = BloomFilterCompressor()
    bits = np.zeros(8000, dtype=np.uint8)
    bits[[5, 999, 4321, 7777]] = 1
    bitmap, witness, p, n, ratio = c.compress(bits)
    k, _ = c._calculate_optimal_params(n, p)
    out = c.decompress(bitmap, witness, n, float(np.float32(k)))
    np.testing.assert_array_equal(out, bits)
    assert ratio < 0.2


def test_ratio_beats_naive_at_design_densities():
    c = BloomFilterCompressor()
    bits = make_bits(20000, 0.1, seed=3)
    _, _, _, _, ratio = c.compress(bits)
    assert ratio < 0.75  # theory: ~l/n + pass_rate ~ 0.62 at p=0.1
