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

These factories are the product path: models/blocked_pipeline.py routes
chunk encode/decode through them whenever the public API is constructed
with ``devices=``/a mesh (models/video.py), not only from tests.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

from new_bloom_filter_repo_tpu.ops.pallas import blocked as bk


def _mesh_interpret(mesh: Mesh) -> bool:
    """Pallas interpret mode must follow the MESH devices, not the
    process default backend: a virtual-CPU mesh on a TPU-attached host
    (the 1-chip dev-rig fallback) would otherwise lower Mosaic TPU
    kernels for CPU devices and fail to compile."""
    return mesh.devices.flat[0].platform != "tpu"


def _encode_fn(*, k_lanes, vh, nw, interpret):
    kwargs = {"k_lanes": k_lanes, "vh": vh, "interpret": interpret}
    if nw is not None:
        kwargs["nw"] = nw
    return partial(bk.blocked_encode, **kwargs)


def make_blocked_encode_dp(mesh: Mesh, *, k_lanes: int, vh: int,
                           nw: int = None):
    """Jitted frame-sharded blocked encode over mesh axis 'dp'.

    Same signature/returns as ops.pallas.blocked.blocked_encode; the
    leading frame axis of every argument must divide mesh.shape['dp'].
    """
    sharded = jax.shard_map(
        _encode_fn(k_lanes=k_lanes, vh=vh, nw=nw,
                   interpret=_mesh_interpret(mesh)), mesh=mesh,
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
    sharded = jax.shard_map(
        _encode_fn(k_lanes=k_lanes, vh=vh, nw=nw,
                   interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(P("dp", "sp"), P("dp", "sp"), P("dp", "sp"),
                  P("dp", "sp"), P("dp", "sp"), P("dp"), P("dp")),
        out_specs=(P("dp", "sp"), P("dp", "sp"), P("dp", "sp"),
                   P("dp", "sp"), P("dp", "sp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def _encode_h_fn(*, k_lanes, vh, nw, interpret):
    kwargs = {"k_lanes": k_lanes, "vh": vh, "interpret": interpret}
    if nw is not None:
        kwargs["nw"] = nw
    return partial(bk.blocked_encode_h, **kwargs)


def make_blocked_encode_h_dp(mesh: Mesh, *, k_lanes: int, vh: int,
                             nw: int = None):
    """Frame-sharded hash-native encode: the per-geometry tables
    (h1/h2/act_hi/act_lo, (NB,IPB)) replicate across dp; positions and
    the activation compare run in-kernel (no materialized a/b/act).
    Argument order matches ops.pallas.blocked.blocked_encode_h."""
    sharded = jax.shard_map(
        _encode_h_fn(k_lanes=k_lanes, vh=vh, nw=nw,
                     interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(P("dp"), P(), P(), P(), P(), P("dp"),
                  P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"),) * 5,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_blocked_encode_h_dpsp(mesh: Mesh, *, k_lanes: int, vh: int,
                               nw: int = None):
    """Hash-native encode sharded over frames AND blocks; the tables
    shard their block axis over 'sp'."""
    arr = P("dp", "sp")
    tab = P("sp")
    sharded = jax.shard_map(
        _encode_h_fn(k_lanes=k_lanes, vh=vh, nw=nw,
                     interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(arr, tab, tab, tab, tab, arr,
                  P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(arr,) * 5,
        check_vma=False,
    )
    return jax.jit(sharded)


def _membership_h_fn(*, k_lanes, nw, interpret):
    kwargs = {"k_lanes": k_lanes, "interpret": interpret}
    if nw is not None:
        kwargs["nw"] = nw
    return partial(bk.blocked_membership_h, **kwargs)


def make_blocked_membership_h_dp(mesh: Mesh, *, k_lanes: int,
                                 nw: int = None):
    """Frame-sharded hash-native membership pass."""
    sharded = jax.shard_map(
        _membership_h_fn(k_lanes=k_lanes, nw=nw,
                         interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(P("dp"), P(), P(), P(), P(),
                  P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_blocked_membership_h_dpsp(mesh: Mesh, *, k_lanes: int,
                                   nw: int = None):
    """Hash-native membership sharded over frames AND blocks."""
    arr = P("dp", "sp")
    tab = P("sp")
    sharded = jax.shard_map(
        _membership_h_fn(k_lanes=k_lanes, nw=nw,
                         interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(arr, tab, tab, tab, tab,
                  P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(arr, arr),
        check_vma=False,
    )
    return jax.jit(sharded)


def _decode_fn(*, k_lanes, vh, nw, interpret):
    mkw = {"k_lanes": k_lanes, "interpret": interpret}
    if nw is not None:
        mkw["nw"] = nw

    def fn(words, a, b, act, m, fk, flags, wit, raw, vseg):
        passes, wcnt = bk.blocked_membership(
            words, a, b, act, m, fk, flags, **mkw)
        mask, vals = bk.blocked_expand(passes, wit, raw, flags, vseg,
                                       vh=vh, interpret=interpret)
        return passes, wcnt, mask, vals

    return fn


def make_blocked_decode_dp(mesh: Mesh, *, k_lanes: int, vh: int,
                           nw: int = None):
    """Jitted frame-sharded membership + expansion over 'dp'."""
    sharded = jax.shard_map(
        _decode_fn(k_lanes=k_lanes, vh=vh, nw=nw,
                   interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(P("dp"),) * 10,
        out_specs=(P("dp"),) * 4,
        check_vma=False,
    )
    return jax.jit(sharded)


def _membership_fn(*, k_lanes, nw, interpret):
    kwargs = {"k_lanes": k_lanes, "interpret": interpret}
    if nw is not None:
        kwargs["nw"] = nw
    return partial(bk.blocked_membership, **kwargs)


def make_blocked_membership_dp(mesh: Mesh, *, k_lanes: int, nw: int = None):
    """Frame-sharded membership pass (decode stage 1 — the product
    decoder needs wcnt on host between membership and expansion to
    slice the witness byte streams)."""
    sharded = jax.shard_map(
        _membership_fn(k_lanes=k_lanes, nw=nw,
                       interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(P("dp"),) * 7,
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_blocked_membership_dpsp(mesh: Mesh, *, k_lanes: int,
                                 nw: int = None):
    """Membership sharded over frames AND blocks."""
    arr = P("dp", "sp")
    sharded = jax.shard_map(
        _membership_fn(k_lanes=k_lanes, nw=nw,
                       interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(arr, arr, arr, arr, P("dp"), P("dp"), P("dp")),
        out_specs=(arr, arr),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_blocked_expand_dp(mesh: Mesh, *, vh: int):
    """Frame-sharded witness/value expansion (decode stage 2)."""
    sharded = jax.shard_map(
        partial(bk.blocked_expand, vh=vh,
                interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(P("dp"),) * 5,
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_blocked_expand_dpsp(mesh: Mesh, *, vh: int):
    """Expansion sharded over frames AND blocks."""
    arr = P("dp", "sp")
    sharded = jax.shard_map(
        partial(bk.blocked_expand, vh=vh,
                interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(arr, arr, arr, P("dp"), arr),
        out_specs=(arr, arr),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_blocked_decode_dpsp(mesh: Mesh, *, k_lanes: int, vh: int,
                             nw: int = None):
    """Membership + expansion sharded over frames ('dp') AND blocks
    ('sp') — the decode mirror of :func:`make_blocked_encode_dpsp`, so a
    4K/8K frame decodes sharded too.  Per-frame scalars (m, floor_k,
    flags) replicate over 'sp'; every array with a block axis shards it.
    Zero collectives (blocks are independent)."""
    sharded = jax.shard_map(
        _decode_fn(k_lanes=k_lanes, vh=vh, nw=nw,
                   interpret=_mesh_interpret(mesh)), mesh=mesh,
        in_specs=(P("dp", "sp"), P("dp", "sp"), P("dp", "sp"),
                  P("dp", "sp"), P("dp"), P("dp"), P("dp"),
                  P("dp", "sp"), P("dp", "sp"), P("dp", "sp")),
        out_specs=(P("dp", "sp"), P("dp", "sp"), P("dp", "sp"),
                   P("dp", "sp")),
        check_vma=False,
    )
    return jax.jit(sharded)
