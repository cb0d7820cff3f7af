"""TPU-native rational-Bloom-filter lossless video compression framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
rational-Bloom-filter video codec (see SURVEY.md): bit-exact lossless video
compression built on rational Bloom filters (floor(k*) deterministic xxhash64
lanes plus one probabilistic fractional lane), with the hot loops — hash-lane
computation, bit-array scatter-OR insert, multi-hash membership gather, and
witness compaction — expressed as fused, statically-shaped vector programs
that XLA tiles onto the TPU VPU, and frame batches sharded over ICI meshes.

Public API parity targets (reference: improved_video_compressor.py:309-669):
  - ImprovedVideoCompressor: compress_video / decompress_video /
    verify_lossless / extract_frames_from_video / save_frames_as_video
  - BloomFilterCompressor: compress / decompress (binary codec)
  - RationalBloomFilter / StandardBloomFilter (probabilistic core)
  - the .bfvc container format (little-endian, magic b'BFVC')
"""

__version__ = "0.1.0"

from new_bloom_filter_repo_tpu.models.bloom import (  # noqa: F401
    RationalBloomFilter,
    StandardBloomFilter,
)

# The codec/video classes resolve lazily (PEP 562) so that importing the
# package for the probabilistic core alone does not trace/compile the
# full video stack.
_LAZY = {
    "BloomFilterCompressor": "new_bloom_filter_repo_tpu.models.binary_codec",
    "FixedVideoCompressor": "new_bloom_filter_repo_tpu.models.video",
    "ImprovedVideoCompressor": "new_bloom_filter_repo_tpu.models.video",
}

__all__ = ["RationalBloomFilter", "StandardBloomFilter", *sorted(_LAZY)]


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
