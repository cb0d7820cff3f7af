"""On-device color-space conversions with OpenCV-exact integer semantics.

The reference leans on OpenCV's C++ ``cvtColor`` for BGR<->GRAY/RGB/YUV
(improved_video_compressor.py:650-654, :794-795, :563-570).  The framework
owns this math on device so the diff path never round-trips to host.

Semantics: 14-bit fixed point (round-half-up descale, saturate-cast) over
the BT.601 matrix.  The luma path (gray, Y) is bit-exact against OpenCV's
classic shift-14 kernel (and against cv2 5.0's BGR2YUV Y channel); chroma
and the inverse agree with cv2 within ±1 at rounding-tie boundaries, which
vary across OpenCV releases.  None of this is bitstream-observable — diff
masks and YUV planes are recorded in the stream — so exactness of the
*round trip inside this framework* is what the test suite pins down.
"""

from __future__ import annotations

import jax.numpy as jnp

_SHIFT = 14
_HALF = 1 << (_SHIFT - 1)

# Classic OpenCV luma coefficients: gray = descale(B*1868 + G*9617 + R*4899)
_B2Y, _G2Y, _R2Y = 1868, 9617, 4899
# BT.601 analog-YUV chroma rows (cv2 >= 5.0 semantics), quantized to 2^-14:
#   U = -0.14713 R - 0.28886 G + 0.436 B + 128
#   V =  0.615  R - 0.51499 G - 0.10001 B + 128
_R2U, _G2U, _B2U = -2411, -4733, 7143
_R2V, _G2V, _B2V = 10076, -8438, -1639
# Inverse: R = Y + 1.13983 V', G = Y - 0.39465 U' - 0.58060 V',
#          B = Y + 2.03211 U'   with U' = U-128, V' = V-128
_V2R, _U2G, _V2G, _U2B = 18675, -6466, -9512, 33294


def _descale(x):
    return (x + _HALF) >> _SHIFT


def _sat_u8(x):
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def bgr_to_gray(bgr: jnp.ndarray) -> jnp.ndarray:
    """uint8 HxWx3 BGR -> uint8 HxW gray, cv2.COLOR_BGR2GRAY-exact."""
    x = bgr.astype(jnp.int32)
    y = _descale(x[..., 0] * _B2Y + x[..., 1] * _G2Y + x[..., 2] * _R2Y)
    return y.astype(jnp.uint8)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    x = rgb.astype(jnp.int32)
    y = _descale(x[..., 2] * _B2Y + x[..., 1] * _G2Y + x[..., 0] * _R2Y)
    return y.astype(jnp.uint8)


def bgr_to_rgb(bgr: jnp.ndarray) -> jnp.ndarray:
    return bgr[..., ::-1]


def rgb_to_bgr(rgb: jnp.ndarray) -> jnp.ndarray:
    return rgb[..., ::-1]


def bgr_to_yuv(bgr: jnp.ndarray) -> jnp.ndarray:
    """uint8 HxWx3 BGR -> uint8 HxWx3 YUV (BT.601; Y cv2-exact, UV ±1)."""
    x = bgr.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = _descale(b * _B2Y + g * _G2Y + r * _R2Y)
    u = _descale(r * _R2U + g * _G2U + b * _B2U + (128 << _SHIFT))
    v = _descale(r * _R2V + g * _G2V + b * _B2V + (128 << _SHIFT))
    return jnp.stack([_sat_u8(y), _sat_u8(u), _sat_u8(v)], axis=-1)


def yuv_to_bgr(yuv: jnp.ndarray) -> jnp.ndarray:
    """uint8 HxWx3 YUV -> uint8 HxWx3 BGR (BT.601 inverse, cv2 ±1)."""
    x = yuv.astype(jnp.int32)
    y, u, v = x[..., 0], x[..., 1], x[..., 2] - 0  # noqa: E741
    up, vp = u - 128, v - 128
    r = y + _descale(vp * _V2R)
    g = y + _descale(up * _U2G + vp * _V2G)
    b = y + _descale(up * _U2B)
    return jnp.stack([_sat_u8(b), _sat_u8(g), _sat_u8(r)], axis=-1)


def gray_to_bgr(gray: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(gray[..., None], 3, axis=-1)
