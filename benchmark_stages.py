#!/usr/bin/env python3
"""Per-stage device timings of the blocked codec at bench geometry.

Times each device stage of the BFV3 codec in isolation on synthetic
1080p content (the same clip bench.py uses): phase A (diff masks +
packed pixels), hash-native blocked encode, membership, and the fused
expansion+chain decode kernel.  Use it to attribute regressions the
single-number `bench.py` headline can't localize.

Stages run on whatever `jax.default_backend()` provides; on the 1-chip
dev rig that is the tunneled TPU (kernel compiles go through a remote
compile server — first run of a new shape takes minutes, repeats are
cached).

Usage:  python benchmark_stages.py [--frames N] [--reps R]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/nbf_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--frames", type=int, default=120,
                    help="inter frames per batch (plus one base frame)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--prefetch-compare", action="store_true",
                    help="Time compress_video with prefetch off vs on "
                         "(upload/compute overlap).  On this rig's "
                         "serializing tunnel overlap usually loses; on "
                         "duplex-link hosts it wins — this mode measures "
                         "instead of assuming")
    ap.add_argument("--host", action="store_true",
                    help="Also time the HOST stages of the production "
                         "byte pipeline (record assembly/parse) via the "
                         "instrumented encode_chunk/decode_run on a "
                         "15-frame chunk — includes device->host pulls, "
                         "which are tunnel-bound on this rig")
    args = ap.parse_args(argv)

    import functools

    import jax
    import jax.numpy as jnp

    from bench import make_clip
    from new_bloom_filter_repo_tpu.models import blocked_pipeline as bp
    from new_bloom_filter_repo_tpu.models.binary_codec import _filter_scalars
    from new_bloom_filter_repo_tpu.models.bloom import (
        optimal_compression_params,
    )
    from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk

    frames = make_clip(args.frames + 1, args.height, args.width)
    base, chunk = frames[0], frames[1:]
    f = len(chunk)
    h, w, _ = base.shape
    n = h * w
    tab = bp.blocked_tables(n)
    nb, nbk = tab["nb"], tab["nbk"]
    npadk = nbk * bk.IPB
    stacked = jax.device_put(np.stack([base] + chunk))
    jax.block_until_ready(stacked)

    masks, counts_d, vals = bp._phase_a(stacked, npad=npadk, nb=nbk)
    counts = jax.device_get(counts_d)
    frame_counts = counts.sum(axis=1)
    m_arr = np.ones(f, np.int32)
    fk_arr = np.zeros(f, np.int32)
    thi = np.zeros(f, np.uint32)
    tlo = np.zeros(f, np.uint32)
    max_block = 1
    for j in range(f):
        cnt = int(frame_counts[j])
        p = cnt / n
        max_block = max(max_block, int(counts[j].max()))
        k, l = optimal_compression_params(n, p)
        m = int(round(l / nb)) if l else 0
        m_arr[j] = min(m, bk.MMAX)
        _, floor_k, (a_hi, a_lo) = _filter_scalars(k)
        fk_arr[j] = floor_k
        thi[j] = a_hi
        tlo[j] = a_lo
    vh = bp._vh_bucket(max_block)
    k_lanes = bk.k_bucket(int(fk_arr.max()))
    nw = bk.nw_bucket(int(m_arr.max()))
    print(f"f={f} nb={nb} nbk={nbk} vh={vh} k_lanes={k_lanes} nw={nw} "
          f"mean_m={m_arr.mean():.0f}", flush=True)

    m_j = jnp.asarray(m_arr)
    thi_j = jnp.asarray(thi)
    tlo_j = jnp.asarray(tlo)
    fk_j = jnp.asarray(fk_arr)
    flags = jnp.zeros((f,), jnp.int32)
    raw = jnp.zeros((f, nbk, bk.IPB), jnp.uint8)

    enc = jax.jit(functools.partial(
        bk.blocked_encode_h, k_lanes=k_lanes, vh=vh, nw=nw))
    mem = jax.jit(functools.partial(
        bk.blocked_membership_h, k_lanes=k_lanes, nw=nw))
    expch = jax.jit(functools.partial(bk.blocked_expand_chain, vh=vh))

    def timeit(name, fn, *fargs):
        out = jax.block_until_ready(fn(*fargs))
        t0 = time.time()
        for _ in range(args.reps):
            out = jax.block_until_ready(fn(*fargs))
        dt = (time.time() - t0) / args.reps
        print(f"{name:24s} {dt * 1e3:8.1f} ms  {f / dt:7.1f} fps",
              flush=True)
        return out

    timeit("phase_a",
           functools.partial(bp._phase_a, npad=npadk, nb=nbk), stacked)
    words, wit, wcnt, vseg, vcnt = timeit(
        "encode_h", enc, masks, tab["h1"], tab["h2"], tab["act_hi"],
        tab["act_lo"], vals, m_j, thi_j, tlo_j, fk_j)
    passes, _ = timeit("membership_h", mem, words, tab["h1"], tab["h2"],
                       tab["act_hi"], tab["act_lo"], m_j, thi_j, tlo_j,
                       fk_j, flags)
    base_packed = bp._pack_base(jax.device_put(base), npad=npadk, nb=nbk)
    timeit("expand+chain (fused)", expch, passes, wit, raw, flags, vseg,
           base_packed)

    if args.host:
        from new_bloom_filter_repo_tpu.utils.profiling import (
            measure_host_stages)
        enc_s, dec_s, detail = measure_host_stages(
            [np.asarray(x) for x in frames], reps=args.reps)
        print("-- production pipeline stages (ms/frame, 15-frame chunk) --",
              flush=True)
        for k, v in sorted(detail.items()):
            print(f"{k:24s} {v:8.2f} ms/frame", flush=True)
        host_s = enc_s + dec_s
        print(f"host-cpu total           {host_s * 1e3:8.2f} ms/frame"
              f"  ({1.0 / host_s:7.1f} fps host-bound)", flush=True)

    if args.prefetch_compare:
        from new_bloom_filter_repo_tpu.models.video import (
            ImprovedVideoCompressor)
        clip = [np.asarray(x) for x in frames[: min(61, len(frames))]]
        print("-- prefetch (upload/compute overlap) comparison --",
              flush=True)
        for pf in (False, True):
            comp = ImprovedVideoCompressor(verbose=False, prefetch=pf,
                                           keyframe_interval=1000)
            comp.compress_video(clip[:16], None)      # warm compiles
            t0 = time.time()
            comp.compress_video(clip, None)
            dt = time.time() - t0
            print(f"prefetch={str(pf):5s} {dt:8.2f} s  "
                  f"{len(clip) / dt:7.2f} fps", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
