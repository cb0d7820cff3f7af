"""Test configuration: run the suite on a virtual 8-device CPU platform.

Unit tests run on CPU with 8 host-emulated devices so every sharded path
(shard_map frame parallelism, index-range sharding with OR-reduction)
executes in CI without TPU hardware (SURVEY.md §4).

This environment ships a sitecustomize hook that registers and pins a
remote TPU backend at interpreter start, before conftest can run, so
JAX_PLATFORMS=cpu set here is too late.  Instead we rely on JAX's
multi-backend support: the CPU client initializes lazily, so setting the
host-device-count flag here (before any backend use) still takes effect,
and pinning jax_default_device routes all test computation to CPU.
Set NBF_TEST_TPU=1 to run on the real attached devices instead.
"""

import os

# Must happen before the CPU backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the suite jit-compiles the same programs
# on every run; caching them cuts wall time dramatically on 1-core CI.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/nbf_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

if not os.environ.get("NBF_TEST_TPU"):
    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")
