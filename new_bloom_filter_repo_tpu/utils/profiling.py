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


# Stage keys the instrumented production pipeline reports
# (models/blocked_pipeline.py encode_chunk/decode_run stage_times).
ENC_HOST_KEYS = ("enc_param_math", "enc_host_sections", "enc_deflate",
                 "enc_assembly")
DEC_HOST_KEYS = ("dec_parse", "dec_host_slices")


def measure_host_stages(frames, reps: int = 2):
    """Per-stage wall costs of the production byte pipeline, measured
    from the instrumented real code path on a 15-frame chunk.

    ``frames``: >= 16 uniform uint8 frames (frame 0 is the base).
    Returns (enc_host_s_per_frame, dec_host_s_per_frame,
    detail_ms_per_frame) — host-CPU stages only; device dispatch and
    link transfers are tracked under separate keys in the detail dict.
    Shared by bench.py and benchmark_stages.py so the stage-key lists
    cannot drift between the two harnesses.
    """
    from new_bloom_filter_repo_tpu.models import blocked_pipeline as bp

    base, chunk = frames[0], list(frames[1:16])
    enc = bp.BlockedEncoder()
    dec = bp.BlockedDecoder()
    warm = []
    enc.encode_chunk(base, chunk, warm)
    dec.decode_run(base, warm)
    st_enc, st_dec = {}, {}
    for _ in range(reps):
        payloads = []
        enc.encode_chunk(base, chunk, payloads, stage_times=st_enc)
        dec.decode_run(base, payloads, stage_times=st_dec)
    fr = len(chunk) * reps
    enc_host = sum(st_enc.get(k, 0.0) for k in ENC_HOST_KEYS) / fr
    dec_host = sum(st_dec.get(k, 0.0) for k in DEC_HOST_KEYS) / fr
    detail = {k: round(v / fr * 1e3, 3)
              for k, v in {**st_enc, **st_dec}.items()}
    return enc_host, dec_host, detail
