"""Persistent XLA compilation cache setup for entry points.

TPU Mosaic/XLA compiles in this project's target environments can go
through a slow remote-compile path; the persistent cache makes repeat
process launches (CLI runs, benchmark sweeps, the verify harness) start
in seconds instead of minutes.  Entry points call :func:`enable` BEFORE
importing jax-touching modules; it only fills in defaults, never
overrides values the user already set (so it is safe in embedding
applications — unlike an import-time env mutation).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    """Set the JAX persistent-compilation-cache env defaults.

    Returns the cache directory in effect.  No-op for any variable the
    environment already defines.
    """
    d = (cache_dir
         or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or os.path.expanduser("~/.cache/nbf_jax_cache"))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", d)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    return os.environ["JAX_COMPILATION_CACHE_DIR"]
