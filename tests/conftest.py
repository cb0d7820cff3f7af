"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Unit tests run on the CPU platform with 8 host-emulated devices so that
every sharded path (shard_map frame parallelism, index-range sharding with
OR-reduction) executes in CI without TPU hardware, per SURVEY.md §4.
Set NBF_TEST_TPU=1 to run the suite on real devices instead.
"""

import os

if not os.environ.get("NBF_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset accelerator
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# Persistent compilation cache: the suite jit-compiles the same programs
# on every run; caching them cuts wall time dramatically on 1-core CI.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/nbf_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
