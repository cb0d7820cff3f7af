"""Sharded batch Bloom encode/decode steps over a (dp, sp) mesh.

One compiled SPMD program encodes a whole batch of binary frames:

* the batch axis shards over ``dp`` (frame parallelism);
* the flattened index axis shards in contiguous blocks over ``sp``
  (sequence parallelism of the reference's two full index passes,
  SURVEY.md §5 long-context notes);
* the insert pass produces per-shard bit-array partials combined by an
  **OR-all-reduce** (lax.pmax) over ICI;
* witness segments are placed in ascending global index order using an
  exclusive scan of all-gathered per-shard pass counts — bit-identical
  to the sequential reference semantics regardless of sharding.

Per-frame k varies with density, so lanes are computed to a static
``k_max`` and masked per frame (ops.bloom_core lane-masked variants).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from new_bloom_filter_repo_tpu.ops.bloom_core import (
    MAX_LANES,
    insert_partial_lanes,
    membership_lanes,
    witness_compact,
)


def _offsets_for_rank(counts_all, axis_name):
    """Exclusive prefix of per-shard counts for this shard. counts_all:
    (S, b) all-gathered counts; returns (b,) offsets."""
    s = counts_all.shape[0]
    my = jax.lax.axis_index(axis_name)
    ranks = jnp.arange(s, dtype=jnp.int32)[:, None]
    return jnp.sum(jnp.where(ranks < my, counts_all, 0), axis=0)


def make_sharded_encode(mesh: Mesh, n: int, l_pad: int,
                        k_max: int = MAX_LANES):
    """Build the jitted sharded batch-encode step.

    Returns fn(bits (B,n) u8, tables 6x(n,) u32, l (B,) u32,
               t_hi (B,) u32, t_lo (B,) u32, floor_k (B,) i32)
      -> (bit_arrays (B,l_pad) u8, witness (B,n) u8, counts (B,) i32)
    """
    sp = mesh.shape["sp"]
    if n % sp != 0:
        raise ValueError(f"n={n} must divide by sp={sp}")

    def body(bits, h1hi, h1lo, h2hi, h2lo, ahi, alo, l, thi, tlo, fk):
        h1, h2, act = (h1hi, h1lo), (h2hi, h2lo), (ahi, alo)
        ins = jax.vmap(
            lambda bb, ll, th, tl, kk: insert_partial_lanes(
                bb, h1, h2, act, ll, th, tl, kk, k_max, l_pad))
        partial_bits = ins(bits, l, thi, tlo, fk)          # (b, l_pad)
        full_bits = jax.lax.pmax(partial_bits, "sp")       # OR over ICI
        mem = jax.vmap(
            lambda fb, ll, th, tl, kk: membership_lanes(
                fb, h1, h2, act, ll, th, tl, kk, k_max))
        pmask = mem(full_bits, l, thi, tlo, fk)            # (b, m)
        wit_local, cnt_local = jax.vmap(witness_compact)(bits, pmask)
        counts_all = jax.lax.all_gather(cnt_local, "sp")   # (S, b)
        offs = _offsets_for_rank(counts_all, "sp")         # (b,)
        m = bits.shape[1]

        def place(seg, cnt, off):
            idx = off.astype(jnp.int32) + jnp.arange(m, dtype=jnp.int32)
            vals = jnp.where(jnp.arange(m) < cnt, seg, 0).astype(jnp.uint8)
            return jnp.zeros((n,), dtype=jnp.uint8).at[idx].set(
                vals, mode="drop")

        witness_partial = jax.vmap(place)(wit_local, cnt_local, offs)
        witness_full = jax.lax.pmax(witness_partial, "sp")
        total = jax.lax.psum(cnt_local, "sp")
        return full_bits, witness_full, total

    shmapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp", "sp"),
                  P("sp"), P("sp"), P("sp"), P("sp"), P("sp"), P("sp"),
                  P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp", None), P("dp", None), P("dp")),
        check_vma=False,
    )

    @jax.jit
    def encode(bits, tables, l, t_hi, t_lo, floor_k):
        h1hi, h1lo, h2hi, h2lo, ahi, alo = tables
        return shmapped(bits, h1hi, h1lo, h2hi, h2lo, ahi, alo,
                        l, t_hi, t_lo, floor_k)

    return encode


def make_sharded_decode(mesh: Mesh, n: int, l_pad: int,
                        k_max: int = MAX_LANES):
    """Build the jitted sharded batch-decode step.

    Returns fn(bit_arrays (B,l_pad), witness (B,n), tables, l, t_hi,
               t_lo, floor_k) -> bits (B,n) u8
    """
    sp = mesh.shape["sp"]
    if n % sp != 0:
        raise ValueError(f"n={n} must divide by sp={sp}")

    def body(bitmaps, witness, h1hi, h1lo, h2hi, h2lo, ahi, alo,
             l, thi, tlo, fk):
        h1, h2, act = (h1hi, h1lo), (h2hi, h2lo), (ahi, alo)
        mem = jax.vmap(
            lambda fb, ll, th, tl, kk: membership_lanes(
                fb, h1, h2, act, ll, th, tl, kk, k_max))
        pmask = mem(bitmaps, l, thi, tlo, fk)              # (b, m)
        pass_u32 = pmask.astype(jnp.uint32)
        cnt_local = jnp.sum(pass_u32, axis=1).astype(jnp.int32)
        counts_all = jax.lax.all_gather(cnt_local, "sp")
        offs = _offsets_for_rank(counts_all, "sp")         # (b,)
        widx = (jnp.cumsum(pass_u32, axis=1) - pass_u32
                + offs[:, None].astype(jnp.uint32))
        out = jnp.where(pmask,
                        jnp.take_along_axis(witness, widx.astype(jnp.int32),
                                            axis=1),
                        jnp.uint8(0)).astype(jnp.uint8)
        return out

    shmapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp", None), P("dp", None),
                  P("sp"), P("sp"), P("sp"), P("sp"), P("sp"), P("sp"),
                  P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=P("dp", "sp"),
        check_vma=False,
    )

    @jax.jit
    def decode(bit_arrays, witness, tables, l, t_hi, t_lo, floor_k):
        h1hi, h1lo, h2hi, h2lo, ahi, alo = tables
        return shmapped(bit_arrays, witness, h1hi, h1lo, h2hi, h2lo,
                        ahi, alo, l, t_hi, t_lo, floor_k)

    return decode


def make_gop_masks_dp(mesh: Mesh):
    """Frame-sharded GOP diff masks: (prev, curr) frame pairs shard over
    'dp' (both operands carry the shift, so no boundary exchange).

    Returns fn(prev (B,h,w[,c]) u8, curr (B,h,w[,c]) u8)
      -> (masks (B,n8) u8, packed (B,n8/8) u8, counts (B,) i32);
    mesh.shape['dp'] must divide B (shard_map shards the leading axis
    evenly across dp)."""
    from new_bloom_filter_repo_tpu.models import gop as gop_mod
    sharded = jax.shard_map(
        gop_mod.gop_masks_pairs, mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_gop_encode_dp(mesh: Mesh, *, l_pad: int, vmax: int,
                       k_max: int = MAX_LANES):
    """Frame-sharded GOP Bloom encode over 'dp' (the BFV2/reference
    record layout): frames, masks and per-frame scalars shard their
    leading axis; the hash tables replicate.  Same signature/returns as
    models.gop.gop_encode."""
    from new_bloom_filter_repo_tpu.models import gop as gop_mod

    def body(masks, frames_curr, h1, h2, act, l, t_hi, t_lo, fk):
        return gop_mod.gop_encode(masks, frames_curr, h1, h2, act,
                                  l, t_hi, t_lo, fk,
                                  l_pad=l_pad, vmax=vmax, k_max=k_max)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P(), P(), P(),
                  P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"),) * 4,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_gop_decode_fields_dp(mesh: Mesh, *, n: int, vmax: int,
                              k_max: int = MAX_LANES):
    """Frame-sharded decode fields for BFV2 records: membership, witness
    expansion and value gather shard over 'dp'; only the (cheap,
    sequential) gop_chain runs unsharded afterwards."""
    from new_bloom_filter_repo_tpu.models import gop as gop_mod

    def body(pb, pw, vals, flags, h1, h2, act, l, t_hi, t_lo, fk):
        return gop_mod.gop_decode_fields(pb, pw, vals, flags, h1, h2, act,
                                         l, t_hi, t_lo, fk,
                                         n=n, vmax=vmax, k_max=k_max)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P(), P(), P(),
                  P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_batch_arrays(mesh: Mesh, bits, tables, scalars):
    """Device-put batch inputs with their canonical shardings."""
    put = jax.device_put
    bits = put(bits, NamedSharding(mesh, P("dp", "sp")))
    tables = tuple(put(t, NamedSharding(mesh, P("sp"))) for t in tables)
    scalars = tuple(put(s, NamedSharding(mesh, P("dp"))) for s in scalars)
    return bits, tables, scalars
