"""Multi-chip execution of the blocked (BFV3) codec.

Both axes of the blocked profile are collective-free:

* ``dp`` — frames are embarrassingly parallel (every frame carries its
  own sub-filters, witness segments and value buckets);
* ``sp`` — *blocks within a frame* are independent too (each 1024-index
  block owns a private sub-filter and byte-aligned witness segment), so
  a single oversized frame (4K/8K) shards its block axis across chips
  with plain shard_map and zero communication — a structural win over
  the reference layout, whose global bit array needs an OR-all-reduce
  (that path remains available via the BFV2 cores in parallel/batch.py).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk


def make_blocked_encode_dp(mesh: Mesh, *, k_lanes: int, vh: int):
    """Jitted frame-sharded blocked encode over mesh axis 'dp'.

    Same signature/returns as ops.pallas.blocked.blocked_encode; the
    leading frame axis of every argument must divide mesh.shape['dp'].
    """
    fn = partial(bk.blocked_encode, k_lanes=k_lanes, vh=vh)
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                  P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_blocked_encode_dpsp(mesh: Mesh, *, k_lanes: int, vh: int,
                             nw: int = None):
    """Jitted blocked encode sharded over frames ('dp') AND the block
    axis ('sp') — within-frame sharding for oversized frames.  The
    block-axis dims of every argument must divide mesh.shape['sp']."""
    kwargs = {"k_lanes": k_lanes, "vh": vh}
    if nw is not None:
        kwargs["nw"] = nw
    fn = partial(bk.blocked_encode, **kwargs)
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("dp", "sp"), P("dp", "sp"), P("dp", "sp"),
                  P("dp", "sp"), P("dp", "sp"), P("dp"), P("dp")),
        out_specs=(P("dp", "sp"), P("dp", "sp"), P("dp", "sp"),
                   P("dp", "sp"), P("dp", "sp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_blocked_decode_dp(mesh: Mesh, *, k_lanes: int, vh: int):
    """Jitted frame-sharded membership + expansion over 'dp'."""

    def fn(words, a, b, act, m, fk, flags, wit, raw, vseg):
        passes, wcnt = bk.blocked_membership(
            words, a, b, act, m, fk, flags, k_lanes=k_lanes)
        mask, vals = bk.blocked_expand(passes, wit, raw, flags, vseg,
                                       vh=vh)
        return passes, wcnt, mask, vals

    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("dp"),) * 10,
        out_specs=(P("dp"),) * 4,
        check_vma=False,
    )
    return jax.jit(sharded)
