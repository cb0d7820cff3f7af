"""Parity and property tests for the host-side Bloom filter oracle.

Checks the semantics the whole codec rests on, against an independent
transcription of the reference's behavior built directly on the C xxhash
wheel (reference: rational_bloom_filter.py:103-182,
improved_video_compressor.py:65-138):

  * double hashing (h1 + i*h2) mod m with the documented seed sets
  * activation iff xxh64(item, act_seed)/(2**64-1) < frac(k*) in float64,
    and the exactness of the integer-threshold reformulation
  * no false negatives, FPR in the theoretical ballpark
  * the optimal-parameter formulas
"""

import math
import random

import numpy as np
import pytest

from new_bloom_filter_repo_tpu.models.bloom import (
    P_STAR,
    RationalBloomFilter,
    StandardBloomFilter,
    activation_threshold_u64,
    optimal_compression_params,
)

xxhash = pytest.importorskip("xxhash")


def ref_activation(item, seed, p_activation):
    """Literal reference activation test (float64 division semantics)."""
    h = xxhash.xxh64_intdigest(str(item), seed)
    return h / (2 ** 64 - 1) < p_activation


@pytest.mark.parametrize("p_act", [0.0, 1e-12, 0.1, 0.32453, 0.5, 0.99,
                                   1.0 - 2 ** -53])
def test_activation_threshold_is_exact(p_act):
    t = activation_threshold_u64(p_act)
    rng = random.Random(0)
    samples = [0, 1, 2 ** 63, 2 ** 64 - 1, max(0, t - 1), t % 2 ** 64,
               min(2 ** 64 - 1, t + 1)]
    samples += [rng.randrange(2 ** 64) for _ in range(500)]
    denom = 2 ** 64 - 1
    for h in samples:
        assert (h < t) == (h / denom < p_act), (h, t, p_act)


@pytest.mark.parametrize("seeds,act_seed", [("video", 999), ("compress", 999)])
def test_rational_filter_matches_reference_semantics(seeds, act_seed):
    m, k_star = 997, 2.7
    f = RationalBloomFilter(m, k_star, seeds=seeds)
    h1_seed, h2_seed = f.h1_seed, f.h2_seed
    items = list(range(500))
    inserted = items[::3]

    # Independent reference-semantics model.
    bits = np.zeros(m, dtype=np.uint8)
    floor_k = math.floor(k_star)
    p_act = k_star - floor_k
    for it in inserted:
        h1 = xxhash.xxh64_intdigest(str(it), h1_seed)
        h2 = xxhash.xxh64_intdigest(str(it), h2_seed)
        lanes = floor_k + (1 if ref_activation(it, act_seed, p_act) else 0)
        for i in range(lanes):
            bits[(h1 + i * h2) % m] = 1

    for it in inserted:
        f.add_index(it)

    np.testing.assert_array_equal(f.bit_array, bits)

    # Query parity on all items.
    for it in items:
        h1 = xxhash.xxh64_intdigest(str(it), h1_seed)
        h2 = xxhash.xxh64_intdigest(str(it), h2_seed)
        lanes = floor_k + (1 if ref_activation(it, act_seed, p_act) else 0)
        want = all(bits[(h1 + i * h2) % m] for i in range(lanes))
        assert f.check_index(it) == want


def test_research_seed_set_uses_ceil_k_activation_seed():
    f = RationalBloomFilter(101, 2.5, seeds="research")
    assert f.activation_seed == 3
    assert (f.h1_seed, f.h2_seed) == (0, 1)


def test_no_false_negatives_rational():
    f = RationalBloomFilter(2048, 3.4, seeds="research")
    items = [f"item-{i}" for i in range(300)]
    for it in items:
        f.add(it)
    assert all(f.contains(it) for it in items)


def test_no_false_negatives_standard():
    f = StandardBloomFilter(2048, 3)
    items = [f"s-{i}" for i in range(300)]
    f.add_many(items)
    assert all(f.contains(it) for it in items)


def test_fpr_close_to_theory():
    n, m = 500, 4096
    k_star = RationalBloomFilter.get_optimal_hash_count(m, n)
    f = RationalBloomFilter(m, k_star, seeds="research")
    for i in range(n):
        f.add(f"in-{i}")
    probes = 20000
    fp = sum(f.contains(f"out-{j}") for j in range(probes)) / probes
    theory = (1 - math.exp(-k_star * n / m)) ** k_star
    assert fp < 4 * theory + 0.01, (fp, theory)


def test_optimal_size_and_hash_count():
    assert StandardBloomFilter.get_optimal_size(1000, 0.01) == math.ceil(
        -(1000 * math.log(0.01)) / (math.log(2) ** 2)
    )
    assert StandardBloomFilter.get_optimal_hash_count(9585, 1000) == round(
        (9585 / 1000) * math.log(2)
    )
    k_star = RationalBloomFilter.get_optimal_hash_count(9585, 1000)
    assert abs(k_star - (9585 / 1000) * math.log(2)) < 1e-12


def test_optimal_compression_params():
    # Reference formulas (improved_video_compressor.py:161-196).
    n = 100000
    for p in (0.05, 0.1, 0.2, 0.3):
        k, l = optimal_compression_params(n, p)
        q = 1 - p
        want_k = math.log2(q * math.log(2) ** 2 / p)
        assert abs(k - max(0.1, want_k)) < 1e-12
        assert l == max(1, int(p * n * want_k / math.log(2)))
    assert optimal_compression_params(n, P_STAR) == (0, 0)
    assert optimal_compression_params(n, 0.4) == (0, 0)
    assert optimal_compression_params(n, 0.00005) == (0, 0)


@pytest.mark.slow
def test_fpr_theoretical_vs_empirical_reference_scale():
    """The reference's full-scale statistical gate: 10 trials x 100k
    random-string probes per filter, empirical FPR vs the exact rational
    formula (port of /root/reference/test_bloom_filters.py:139-201,
    which prints but never asserts; here the tolerance is enforced)."""
    m, n = 100, 10
    k_star = RationalBloomFilter.get_optimal_hash_count(m, n)
    k_std = StandardBloomFilter.get_optimal_hash_count(m, n)
    frac = k_star - math.floor(k_star)
    theo_std = (1 - np.exp(-k_std * n / m)) ** k_std
    theo_rat_exact = ((1 - np.exp(-math.floor(k_star) * n / m))
                      ** math.floor(k_star)
                      * (1 - np.exp(-n / m)) ** frac)

    rng = random.Random(42)
    trials, probes = 10, 100_000
    std_fprs, rat_fprs = [], []
    for _ in range(trials):
        std = StandardBloomFilter(m, k_std)
        rat = RationalBloomFilter(m, k_star)
        members = {f"member-{rng.getrandbits(64):016x}" for _ in range(n)}
        for e in members:
            std.add(e)
            rat.add(e)
        fp_std = fp_rat = 0
        for j in range(probes):
            probe = f"probe-{rng.getrandbits(64):016x}"
            if probe in members:
                continue
            if std.contains(probe):
                fp_std += 1
            if rat.contains(probe):
                fp_rat += 1
        std_fprs.append(fp_std / probes)
        rat_fprs.append(fp_rat / probes)

    emp_std = float(np.mean(std_fprs))
    emp_rat = float(np.mean(rat_fprs))
    # Standard filter hashes each lane with an independent seed, so it
    # tracks the independent-hash formula closely: 1M probes gives ~1%
    # sampling error; 25% relative is a safe regression gate.
    assert abs(emp_std - theo_std) / theo_std < 0.25, (emp_std, theo_std)
    # The rational filter uses double hashing (h1 + i*h2) mod m — the
    # reference's exact semantics (rational_bloom_filter.py:115-119) —
    # which at m=100 measurably inflates FPR over the independent-hash
    # formulas (measured ~2.8x the simple theory; the reference's own
    # script prints the same discrepancy and asserts nothing).  Gate on
    # a band wide enough for that structural inflation but far tighter
    # than any seed/activation bug would land (those shift FPR by
    # orders of magnitude toward 0 or 1).
    theo_rat_simple = (1 - np.exp(-k_star * n / m)) ** k_star
    assert theo_rat_exact < theo_rat_simple  # formula sanity
    assert 0.5 * theo_rat_simple < emp_rat < 6.0 * theo_rat_simple, (
        emp_rat, theo_rat_simple)
