"""Inter-frame difference extraction and application.

Device-side re-design of the reference's diff path
(improved_video_compressor.py:768-909): the binary change mask is computed
on device as one fused elementwise program; changed-value gather/scatter
stays in numpy on host (the values feed the host zlib stage anyway).

Exactness rule (framework fix, documented): when the effective threshold
is 0 the mask is ``any channel differs`` — prev[c] != curr[c] OR-reduced
over channels — which guarantees bit-exact reconstruction for color
inputs.  The reference thresholds only the gray/Y channel
(improved_video_compressor.py:801-808), which can drop pure-chroma changes
even at threshold 0; with a positive threshold we reproduce the
reference's gray/Y semantics (that mode intentionally tolerates noise).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from new_bloom_filter_repo_tpu.ops.color import bgr_to_gray


@partial(jax.jit, static_argnames=("use_direct_yuv",))
def diff_mask_thresholded(prev, curr, threshold, use_direct_yuv: bool = False):
    """Reference-style mask: |gray/Y(prev) - gray/Y(curr)| > threshold.

    prev/curr: uint8 HxW or HxWxC device arrays; threshold: float scalar.
    Returns uint8 HxW mask (reference: improved_video_compressor.py:784-808).
    """
    if prev.ndim == 3 and prev.shape[2] > 1:
        if use_direct_yuv and prev.shape[2] >= 3:
            pg, cg = prev[:, :, 0], curr[:, :, 0]
        else:
            pg, cg = bgr_to_gray(prev), bgr_to_gray(curr)
    else:
        pg, cg = prev, curr
    d = jnp.abs(pg.astype(jnp.int16) - cg.astype(jnp.int16))
    return (d > threshold).astype(jnp.uint8)


@jax.jit
def diff_mask_exact(prev, curr):
    """Exact mask: 1 where any channel differs — the bit-exact mode."""
    neq = prev != curr
    if neq.ndim == 3:
        neq = jnp.any(neq, axis=-1)
    return neq.astype(jnp.uint8)


def _planes_full_res(yuv_info: dict, shape) -> bool:
    """Plane-indexed reads/writes are only valid when the planes are at
    frame resolution (444 wrappers); native subsampled planes (I420
    sources, utils/videoio.read_raw_yuv) use the array channels."""
    for plane in ("y_plane", "u_plane", "v_plane"):
        arr = yuv_info.get(plane)
        if arr is None or np.asarray(arr).shape != tuple(shape):
            return False
    return True


def gather_changed_values(curr: np.ndarray, mask: np.ndarray,
                          yuv_info: dict | None = None) -> np.ndarray:
    """Exact values of changed pixels, all channels interleaved per pixel
    (reference: improved_video_compressor.py:810-842).

    For YUV frames with plane info, values are read from the original
    planes so reconstruction is plane-exact (:818-829).
    """
    mask = np.asarray(mask, dtype=bool)
    curr = np.asarray(curr)
    if curr.ndim == 3 and curr.shape[2] > 1:
        if yuv_info is not None and _planes_full_res(yuv_info, mask.shape):
            rows, cols = np.nonzero(mask)
            vals = np.empty((rows.size, 3), dtype=np.uint8)
            vals[:, 0] = yuv_info["y_plane"][rows, cols]
            vals[:, 1] = yuv_info["u_plane"][rows, cols]
            vals[:, 2] = yuv_info["v_plane"][rows, cols]
            return vals.reshape(-1)
        return curr[mask].reshape(-1)
    return curr[mask].copy()


def apply_diff(base: np.ndarray, mask: np.ndarray, values: np.ndarray,
               yuv_info: dict | None = None) -> np.ndarray:
    """Scatter exact changed values onto a copy of the base frame
    (reference: improved_video_compressor.py:849-909)."""
    out = np.asarray(base).copy()
    mask = np.asarray(mask, dtype=bool)
    if out.ndim == 3 and out.shape[2] > 1:
        c = out.shape[2]
        vals = np.asarray(values, dtype=out.dtype).reshape(-1, c)
        out[mask] = vals
        if yuv_info is not None and _planes_full_res(yuv_info, mask.shape):
            rows, cols = np.nonzero(mask)
            yuv_info["y_plane"][rows, cols] = vals[:, 0]
            yuv_info["u_plane"][rows, cols] = vals[:, 1]
            yuv_info["v_plane"][rows, cols] = vals[:, 2]
    else:
        out[mask] = np.asarray(values, dtype=out.dtype)
    return out
