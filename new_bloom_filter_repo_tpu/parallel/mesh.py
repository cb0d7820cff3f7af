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

import re

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


def _provision_virtual_cpus(n_devices: int) -> None:
    """Arrange for >= n_devices virtual host (CPU) devices if possible.

    ``xla_force_host_platform_device_count`` is read once, when the CPU
    backend is first initialized — so this only helps if nothing has
    touched any backend yet (the common case for CLI runs).  Harmless
    when real devices turn out to be plentiful: it only widens the host
    platform, which then simply goes unused.

    NOTE: this mutates the process-global XLA_FLAGS env var as a side
    effect (see auto_mesh).  When the embedding process has explicitly
    pinned a non-CPU platform via JAX_PLATFORMS, real accelerators are
    expected and the widening is skipped."""
    import os

    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        return
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms.lower():
        return  # accelerator platform pinned; don't touch host config
    cur = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", cur)
    if m:
        if int(m.group(1)) >= n_devices:
            return                      # user already asked for enough
        # last occurrence wins in XLA's parser, so never append a
        # smaller count after a larger user-set one
        n_devices = max(n_devices, int(m.group(1)))
    flag = f"--xla_force_host_platform_device_count={n_devices}"
    os.environ["XLA_FLAGS"] = (cur + " " + flag).strip()


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> dict:
    """Multi-host (DCN) initialization for multi-slice frame sharding.

    Thin wrapper over ``jax.distributed.initialize`` (SURVEY.md §2 comm
    row: ICI within a slice via shard_map collectives, DCN across hosts
    via jax.distributed).  On TPU pods the arguments are discovered from
    the environment; pass them explicitly for CPU/GPU multi-process
    runs.  After initialization, ``jax.devices()`` spans every host's
    chips, so ``auto_mesh()`` / ``make_mesh()`` build global meshes and
    the codec's dp/sp sharding rides DCN between hosts transparently —
    per-frame records stay host-independent because the emitted stream
    is canonical per geometry (models/blocked_pipeline.py).

    Idempotent: repeat calls return the existing runtime state.
    Returns {"process_id", "num_processes", "local_devices",
    "global_devices"}.
    """
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None:
        initialized = bool(is_init())
    else:  # older jax: fall back to the internal state
        from jax._src.distributed import global_state as _dist_state
        initialized = _dist_state.client is not None
    if not initialized:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def auto_mesh(n_devices: int | None = None, sp: int = 1) -> Mesh:
    """Reasonable default: all devices on frame parallelism (frames are
    embarrassingly parallel); pass ``sp`` > 1 to reserve an index/block
    axis for within-frame sharding of oversized (4K/8K) frames.

    When ``n_devices`` exceeds the attached device count and no backend
    has initialized yet, this widens the host (CPU) platform by
    appending ``--xla_force_host_platform_device_count`` to the
    process-global XLA_FLAGS env var — a persistent side effect for
    every later backend init in this process (skipped when JAX_PLATFORMS
    pins a non-CPU platform; see _provision_virtual_cpus)."""
    if n_devices:
        _provision_virtual_cpus(n_devices)
    devices = jax.devices()
    if n_devices and len(devices) < n_devices:
        # 1-chip dev rigs: fall back to the (virtual) host platform so a
        # requested mesh width can still be built and tested.  Pallas
        # kernels follow the mesh into interpreter mode
        # (parallel/blocked_batch._mesh_interpret).
        cpus = jax.devices("cpu")
        if len(cpus) >= n_devices:
            devices = cpus
        else:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                f"(and only {len(cpus)} host devices; set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices} "
                f"before the first jax call to emulate a mesh)")
    n = n_devices or len(devices)
    if n % sp != 0:
        raise ValueError(f"sp={sp} must divide device count {n}")
    return make_mesh(n // sp, sp, devices[:n])
