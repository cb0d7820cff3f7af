"""Device-mesh construction helpers.

The codec's parallelism maps onto a 2D logical mesh (SURVEY.md §2
parallelism inventory):

* ``dp`` — data/frame parallelism: independent frames (GOP-aligned once
  keyframes are scheduled) across chips;
* ``sp`` — sequence/index parallelism: the flattened per-frame bit string
  n = H*W partitioned in contiguous blocks; bit-array partials are
  OR-reduced over ICI, witness segments assembled with an all-gather and
  an exclusive scan of per-shard pass counts.

No NCCL/MPI backends: collectives are XLA's TPU collectives emitted by
shard_map, riding ICI within a slice and DCN across hosts via
jax.distributed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, sp) mesh over the first dp*sp devices."""
    if devices is None:
        devices = jax.devices()
    need = dp * sp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def auto_mesh(n_devices: int | None = None) -> Mesh:
    """Reasonable default: split devices between frame and index parallelism,
    favoring frame parallelism (frames are embarrassingly parallel)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    sp = 1
    for cand in (2, 4):
        if n % cand == 0 and n // cand >= 1:
            sp = cand
    dp = n // sp
    return make_mesh(dp, sp, devices[:n])
