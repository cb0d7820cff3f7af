"""Median filtering and noise estimation on device.

The reference estimates per-frame noise as the standard deviation of the
residual against a 5x5 median blur (cv2.medianBlur; reference:
improved_video_compressor.py:727-746) and derives the adaptive diff
threshold from it (:748-766).  Here the median is a data-parallel rank
filter: gather the k*k replicated-border neighborhood into a small leading
axis and take the middle order statistic with a sort — O(k^2 log k^2)
VPU work per pixel, no data-dependent control flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("ksize",))
def median_blur(img: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """k x k median filter with replicated borders (cv2.medianBlur parity).

    img: HxW (or HxWxC, filtered per channel) array.
    """
    if ksize % 2 != 1:
        raise ValueError("ksize must be odd")
    r = ksize // 2
    if img.ndim == 3:
        pad = ((r, r), (r, r), (0, 0))
    else:
        pad = ((r, r), (r, r))
    padded = jnp.pad(img, pad, mode="edge")
    h, w = img.shape[0], img.shape[1]
    windows = jnp.stack(
        [
            padded[dy:dy + h, dx:dx + w]
            for dy in range(ksize)
            for dx in range(ksize)
        ],
        axis=0,
    )
    med = jnp.sort(windows, axis=0)[(ksize * ksize) // 2]
    return med.astype(img.dtype)


@partial(jax.jit, static_argnames=("ksize",))
def noise_level(frame: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Noise sigma = std(frame - median_blur(frame)) in float32
    (reference: improved_video_compressor.py:727-746)."""
    smoothed = median_blur(frame, ksize)
    residual = frame.astype(jnp.float32) - smoothed.astype(jnp.float32)
    return jnp.std(residual)


def adaptive_threshold(frame, noise_tolerance: float, min_threshold: float,
                       max_threshold: float) -> float:
    """clamp(sigma * tolerance, min, max)
    (reference: improved_video_compressor.py:748-766).  Host scalar."""
    sigma = float(noise_level(frame))
    return max(min_threshold, min(max_threshold, sigma * noise_tolerance))
