"""Per-geometry hash-lane tables, computed once on device and cached.

The reference hashes ``str(index)`` with three fixed seeds for every probe
of every frame (improved_video_compressor.py:77-78,94) — the dominant cost
of its hot loops.  Those hashes depend only on the index, never on frame
content, so for a given frame geometry ``n = H*W`` the three u64 lane
tables

    h1[i]  = xxh64(str(i), h1_seed)
    h2[i]  = xxh64(str(i), h2_seed)
    act[i] = xxh64(str(i), activation_seed)

are computed once (a single data-parallel xxh64 sweep on the TPU VPU) and
reused by every frame of that geometry — amortizing the string-hash cost to
~zero per frame (SURVEY.md §7 step 1).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp

from new_bloom_filter_repo_tpu.models.bloom import (
    VIDEO_ACTIVATION_SEED,
    VIDEO_H1_SEED,
    VIDEO_H2_SEED,
)
from new_bloom_filter_repo_tpu.ops.xxh64 import xxh64_decimal

SEED_SETS = {
    # improved_video_compressor.py:62-63,94 — the .bfvc video codec
    "video": (VIDEO_H1_SEED, VIDEO_H2_SEED, VIDEO_ACTIVATION_SEED),
    # bloom_compress.py:159-196 — the standalone image/text codec
    "compress": (0, 1, VIDEO_ACTIVATION_SEED),
}


@dataclass(frozen=True)
class HashTables:
    """u64 lane tables as (hi, lo) uint32 device-array pairs."""

    n: int
    h1: tuple  # (hi, lo)
    h2: tuple
    act: tuple


@jax.jit
def _build_tables(idx):
    h1 = xxh64_decimal(idx, VIDEO_H1_SEED)
    h2 = xxh64_decimal(idx, VIDEO_H2_SEED)
    act = xxh64_decimal(idx, VIDEO_ACTIVATION_SEED)
    return h1, h2, act


@jax.jit
def _build_tables_compress(idx):
    h1 = xxh64_decimal(idx, 0)
    h2 = xxh64_decimal(idx, 1)
    act = xxh64_decimal(idx, VIDEO_ACTIVATION_SEED)
    return h1, h2, act


@lru_cache(maxsize=16)
def get_hash_tables(n: int, seed_set: str = "video") -> HashTables:
    """Build (or fetch cached) lane tables for indices [0, n)."""
    if seed_set not in SEED_SETS:
        raise ValueError(f"unknown seed set: {seed_set!r}")
    idx = jnp.arange(n, dtype=jnp.uint32)
    build = _build_tables if seed_set == "video" else _build_tables_compress
    h1, h2, act = jax.block_until_ready(build(idx))
    return HashTables(n=n, h1=h1, h2=h2, act=act)
