"""Device-side bit packing/unpacking (np.packbits-compatible, big-endian).

The .bfvc records store bitmaps and witnesses as np.packbits bytes
(improved_video_compressor.py:945-951).  Packing on device shrinks
host<->device transfers 8x, which matters because tunnel/PCIe latency —
not compute — bounds the end-to-end pipeline.  Implemented with shifts
and a small reduction instead of jnp.packbits (whose TPU lowering is
slow).
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint8 0/1 array (..., n) with n % 8 == 0 -> packed uint8 (..., n/8).

    Bit order matches np.packbits: the first element lands in the MSB.
    """
    *lead, n = bits.shape
    if n % 8:
        raise ValueError("pack_bits needs a multiple of 8")
    b = bits.reshape(*lead, n // 8, 8).astype(jnp.uint8)
    out = (
        (b[..., 0] << 7) | (b[..., 1] << 6) | (b[..., 2] << 5)
        | (b[..., 3] << 4) | (b[..., 4] << 3) | (b[..., 5] << 2)
        | (b[..., 6] << 1) | b[..., 7]
    )
    return out


def unpack_bits(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    """Packed uint8 (..., m) -> 0/1 uint8 (..., n) with n <= 8*m."""
    *lead, m = packed.shape
    p = packed[..., :, None]
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (p >> shifts) & jnp.uint8(1)
    return bits.reshape(*lead, 8 * m)[..., :n]


def padded_length(n: int, multiple: int = 8) -> int:
    return ((n + multiple - 1) // multiple) * multiple
