"""Tracing & roofline accounting (SURVEY.md §5 — the reference ships only
criterion microbenchmarks; the TPU equivalent is jax.profiler traces plus
per-kernel roofline math).

* ``trace(dir)`` — context manager around ``jax.profiler`` for capturing a
  device trace of any build/query region (viewable in XProf/TensorBoard).
* ``annotate(name)`` — named trace region.
* ``timeit(fn, *args)`` — steady-state timing with compile warmup and
  ``block_until_ready`` fencing; used by the benchmark suite.
* ``query_roofline`` / ``build_roofline`` — bytes-touched models giving the
  speed-of-light time for the two hot paths on a given chip, so measured
  numbers can be reported as a fraction of light.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax

# HBM bandwidth per chip, bytes/s (v5e ≈ 8.2e11; override per target)
DEFAULT_HBM_BW = 8.2e11


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


def timeit(fn, *args, reps: int = 5, warmup: int = 1) -> float:
    """Median-free steady-state seconds per call (mean over reps after warmup)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@dataclass
class Roofline:
    bytes_touched: int
    seconds_at_light: float
    measured_seconds: float

    @property
    def fraction_of_light(self) -> float:
        return self.seconds_at_light / max(self.measured_seconds, 1e-12)


def query_roofline(n_queries: int, k: int, measured_seconds: float,
                   hbm_bw: float = DEFAULT_HBM_BW) -> Roofline:
    """Bytes model for batched count_kmer: per LF step, two ranks, each one
    128-byte bin row + one 24-byte occ row (occ fits cache for small n, so
    this is an upper bound on required traffic)."""
    bytes_touched = n_queries * k * 2 * (128 + 24)
    return Roofline(bytes_touched, bytes_touched / hbm_bw, measured_seconds)


def build_roofline(n_symbols: int, max_read_len: int, measured_seconds: float,
                   hbm_bw: float = DEFAULT_HBM_BW) -> Roofline:
    """Bytes model for BCR construction: each of ~max_read_len stages streams
    the buffer (read+write, u8) and its occ rebuild (~6x compare-reduce reads)."""
    bytes_touched = (max_read_len + 1) * n_symbols * (2 + 6)
    return Roofline(bytes_touched, bytes_touched / hbm_bw, measured_seconds)
