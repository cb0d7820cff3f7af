#!/usr/bin/env python3
"""Headline benchmark: 1080p frames/sec through encode+decode per chip.

Measures the full public pipeline — ImprovedVideoCompressor.compress_video
(diff masks, rational-Bloom device encode, witness packing, zlib stage,
.bfvc container) followed by decompress_video and bit-exact verification —
on a synthetic 1080p BGR clip with realistic inter-frame change density.

Baseline derivation: the reference reports 12.45 s average to compress the
Y4M suite (results.md:139-141) — ~300 CIF frames => 24.1 fps at 352x288,
i.e. ~1.18 fps at 1920x1080 pixel rate, and its shipped path is
encode-only zlib keyframes.  vs_baseline is measured fps (through BOTH
encode and decode, bit-exact verified) against that 1.18 fps equivalent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compilation cache: TPU kernel compiles go through a slow
# remote compile path in this environment; the cache makes repeat runs
# start in seconds instead of minutes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/nbf_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402

REF_EQUIV_1080P_FPS = 1.18
FRAMES = 16
H, W = 1080, 1920


def make_clip(n_frames=FRAMES, h=H, w=W, seed=0):
    """Static camera scene: textured background, moving object, sparse
    sensor noise (~1.5% of pixels/frame)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 220, size=(h, w, 3), dtype=np.uint8)
    frames = []
    for i in range(n_frames):
        f = base.copy()
        noise_mask = rng.random((h, w)) < 0.015
        f[noise_mask] = rng.integers(0, 256, size=(int(noise_mask.sum()), 3))
        x = (40 + 23 * i) % (w - 260)
        y = (60 + 11 * i) % (h - 260)
        f[y:y + 240, x:x + 240] = (30, 200, 240)
        frames.append(f)
    return frames


def main():
    import jax
    from new_bloom_filter_repo_tpu.models.video import ImprovedVideoCompressor

    platform = jax.default_backend()
    frames = make_clip()
    comp = ImprovedVideoCompressor(verbose=False, keyframe_interval=30)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.bfvc")
        # Warm-up pass compiles every (geometry, floor_k) program.
        comp.compress_video(frames[:4], path)
        comp.decompress_video(path)

        t0 = time.time()
        res = comp.compress_video(frames, path)
        t_enc = time.time() - t0
        t0 = time.time()
        rec = comp.decompress_video(path)
        t_dec = time.time() - t0
        v = comp.verify_lossless(frames, rec)

    fps = len(frames) / (t_enc + t_dec)
    core_fps = _device_core_fps()
    out = {
        "metric": "1080p_frames_per_sec_encode_plus_decode_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REF_EQUIV_1080P_FPS, 3),
        "platform": platform,
        "frames": len(frames),
        "encode_s": round(t_enc, 3),
        "decode_s": round(t_dec, 3),
        "compression_ratio": round(res["compression_ratio"], 4),
        "space_savings_pct": round(res["space_savings"] * 100, 2),
        "lossless": bool(v["lossless"]),
        # Device-resident codec throughput (diff + Bloom encode +
        # membership + expand, checksum-only pull).  The end-to-end
        # number above is bounded by this rig's ~34 MB/s host<->device
        # tunnel; this is the per-chip codec capability.
        "device_core_fps": core_fps,
    }
    print(json.dumps(out))


def _device_core_fps():
    """Time the full device codec (encode + membership + expand) on
    resident 15x1080p data, pulling only a checksum."""
    import jax
    import jax.numpy as jnp
    from new_bloom_filter_repo_tpu.models import blocked_pipeline as bp
    from new_bloom_filter_repo_tpu.models.binary_codec import _filter_scalars
    from new_bloom_filter_repo_tpu.models.bloom import (
        optimal_compression_params)
    from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk

    f, n = 15, H * W
    tab = bp.blocked_tables(n)
    nb, npad = tab["nb"], tab["npad"]
    rng = np.random.default_rng(0)
    bits = (rng.random((f, nb, bk.IPB)) < 0.04).astype(np.uint8)
    vals = rng.integers(0, 1 << 24, (f, nb, bk.IPB)).astype(np.int32)
    p = 0.04
    k, l = optimal_compression_params(n, p)
    _, fk, (a_hi, a_lo) = _filter_scalars(k)
    m = max(bp.MIN_M, min(int(round(l / nb)), bk.MMAX))
    m_arr = jnp.full((f,), m, jnp.int32)
    fk_arr = jnp.full((f,), fk, jnp.int32)
    thi = jnp.full((f,), a_hi, jnp.uint32)
    tlo = jnp.full((f,), a_lo, jnp.uint32)
    flags = jnp.zeros((f,), jnp.int32)

    @jax.jit
    def step(bits_d, vals_d):
        a, b, act = bp._frame_mod_tables(
            tab["h1"], tab["h2"], tab["act_hi"], tab["act_lo"],
            m_arr, thi, tlo)
        words, wit, wcnt, vseg, vcnt = bk.blocked_encode(
            bits_d, a, b, act, vals_d, m_arr, fk_arr,
            k_lanes=int(fk), vh=4)
        passes, wcnt2 = bk.blocked_membership(
            words, a, b, act, m_arr, fk_arr, flags, k_lanes=int(fk))
        mask, out_vals = bk.blocked_expand(
            passes, wit, bits_d * 0, flags, vseg, vh=4)
        return (jnp.sum(wcnt) + jnp.sum(mask.astype(jnp.int32))
                + jnp.sum(out_vals))

    bits_d = jax.device_put(bits)
    vals_d = jax.device_put(vals)
    jax.device_get(step(bits_d, vals_d))  # compile
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        jax.device_get(step(bits_d, vals_d))
    dt = (time.time() - t0) / reps
    return round(f / dt, 2)


if __name__ == "__main__":
    main()
