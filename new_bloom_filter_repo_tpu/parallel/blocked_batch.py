"""Multi-chip execution of the blocked (BFV3) codec.

Frames are embarrassingly parallel in the blocked profile (every frame
carries its own sub-filters, witness segments and value buckets), so the
flagship path scales over chips by sharding the frame axis of one
compiled program across the ``dp`` mesh axis with shard_map — each chip
runs the same Pallas kernels on its frame shard; no collectives are
required on this axis.  (Index-range ``sp`` sharding with OR-all-reduce
remains available through the BFV2 cores in parallel/batch.py for
frames too large for a single chip's HBM.)
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
