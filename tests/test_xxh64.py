"""Golden tests for the xxh64 implementations.

Cross-checks three independent implementations — the C ``xxhash`` wheel
(ground truth, same library the reference calls), the pure-Python scalar
spec implementation, and the vectorized JAX lane version — against each
other on the exact probe inputs the codec uses: ASCII decimal strings of
pixel indices with the reference's fixed seeds
(reference: improved_video_compressor.py:62-63,77-78,94).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from new_bloom_filter_repo_tpu.ops import u64 as u
from new_bloom_filter_repo_tpu.ops.xxh64 import xxh64, xxh64_decimal, xxh64_int

xxhash = pytest.importorskip("xxhash")

SEEDS = [0, 1, 999, 0x12345678, 0x87654321]

EDGE_INDICES = (
    [0, 1, 9, 10, 11, 99, 100, 101, 999, 1000, 9999, 10000]
    + [10 ** k for k in range(10)]
    + [10 ** k - 1 for k in range(1, 10)]
    + [2 ** 32 - 1, 2 ** 31, 123456789, 4294967294]
)


def test_scalar_vs_c_library_known_vector():
    # Canonical xxh64 vector: empty input, seed 0.
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"", 0) == xxhash.xxh64_intdigest(b"", 0)


@pytest.mark.parametrize("seed", SEEDS)
def test_scalar_matches_c_library_on_decimal_strings(seed):
    rng = np.random.default_rng(42)
    idxs = EDGE_INDICES + list(rng.integers(0, 2 ** 32, size=200))
    for i in idxs:
        s = str(int(i)).encode("ascii")
        assert xxh64(s, seed) == xxhash.xxh64_intdigest(s, seed), (i, seed)


def test_scalar_long_inputs_match_c_library():
    rng = np.random.default_rng(7)
    for n in [0, 1, 3, 4, 7, 8, 15, 16, 31, 32, 33, 63, 64, 100, 1000]:
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        for seed in [0, 999, 2 ** 63]:
            assert xxh64(data, seed) == xxhash.xxh64_intdigest(data, seed)


@pytest.mark.parametrize("seed", SEEDS)
def test_vectorized_matches_c_library(seed):
    rng = np.random.default_rng(1234)
    idxs = np.array(
        EDGE_INDICES + list(rng.integers(0, 2 ** 32, size=500)), dtype=np.uint32
    )
    hi, lo = xxh64_decimal(jnp.asarray(idxs), seed)
    got = (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        lo, dtype=np.uint64
    )
    want = np.array(
        [xxhash.xxh64_intdigest(str(int(i)), seed) for i in idxs], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


def test_vectorized_contiguous_range():
    # The actual per-frame usage: a dense index range.
    n = 3000
    idxs = jnp.arange(n, dtype=jnp.uint32)
    for seed in (0x12345678, 999):
        hi, lo = xxh64_decimal(idxs, seed)
        got = (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
            lo, dtype=np.uint64
        )
        want = np.array(
            [xxhash.xxh64_intdigest(str(i), seed) for i in range(n)],
            dtype=np.uint64,
        )
        np.testing.assert_array_equal(got, want)


def test_xxh64_int_helper():
    assert xxh64_int(12345, 999) == xxhash.xxh64_intdigest("12345", 999)


class TestU64Primitives:
    def test_add_mul_roundtrip(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 2 ** 64, size=100, dtype=np.uint64)
        b = rng.integers(0, 2 ** 64, size=100, dtype=np.uint64)
        ap = (jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
              jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
        bp = (jnp.asarray((b >> np.uint64(32)).astype(np.uint32)),
              jnp.asarray((b & np.uint64(0xFFFFFFFF)).astype(np.uint32)))

        def collapse(x):
            return (np.asarray(x[0], dtype=np.uint64) << np.uint64(32)) | np.asarray(
                x[1], dtype=np.uint64
            )

        np.testing.assert_array_equal(collapse(u.u64_add(ap, bp)), a + b)
        np.testing.assert_array_equal(collapse(u.u64_mul(ap, bp)), a * b)
        np.testing.assert_array_equal(collapse(u.u64_xor(ap, bp)), a ^ b)
        for r in (1, 11, 23, 27, 31, 32, 33, 47):
            want = ((a << np.uint64(r)) | (a >> np.uint64(64 - r)))
            np.testing.assert_array_equal(collapse(u.u64_rotl(ap, r)), want)
        for r in (1, 29, 32, 33, 63):
            np.testing.assert_array_equal(
                collapse(u.u64_shr(ap, r)), a >> np.uint64(r)
            )
        np.testing.assert_array_equal(np.asarray(u.u64_lt(ap, bp)), a < b)

    def test_mod_u32(self):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 2 ** 64, size=200, dtype=np.uint64)
        ap = (jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
              jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
        for m in [1, 2, 3, 7, 255, 256, 1000003, 2 ** 24 - 1, 2 ** 28 - 1]:
            got = np.asarray(u.u64_mod_u32(ap, jnp.uint32(m)))
            np.testing.assert_array_equal(got, (a % np.uint64(m)).astype(np.uint32))
