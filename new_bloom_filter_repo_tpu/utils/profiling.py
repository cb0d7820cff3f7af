"""Tracing and profiling.

The reference's observability is wall-clock deltas in results dicts
(SURVEY.md §5).  This module keeps that stable metric schema and adds
real device tracing: ``trace()`` wraps a region in a jax.profiler trace
(viewable in TensorBoard/Perfetto), and ``Timer`` collects named span
timings that pipelines can attach to their stats dicts.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler device trace around a region.

    Enabled by passing log_dir or setting NBF_TRACE_DIR; otherwise a
    no-op so hot paths can keep the call site unconditionally.
    """
    log_dir = log_dir or os.environ.get("NBF_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


class Timer:
    """Named wall-clock spans with the reference's fps/seconds schema."""

    def __init__(self):
        self.spans: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.time() - t0

    def stats(self, frames: int = 0) -> Dict:
        out = {f"{k}_time": round(v, 4) for k, v in self.spans.items()}
        if frames:
            for k, v in self.spans.items():
                if v > 0:
                    out[f"{k}_fps"] = round(frames / v, 2)
        return out
