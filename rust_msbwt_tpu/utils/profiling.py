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
import numpy as np

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


def _force_sync(out):
    """Fence on actual completion. ``block_until_ready`` returns before
    execution finishes on the axon-tunneled TPU (measured), so the only
    reliable fence is a (tiny) host transfer of a result element."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "shape"):
            # slice on DEVICE first so only one element crosses to host —
            # np.asarray(leaf) would copy the whole leaf inside the timed region
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)
            return


def timeit(fn, *args, reps: int = 5, warmup: int = 1) -> float:
    """Steady-state seconds per call (mean over reps after warmup)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _force_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force_sync(out)
    return (time.perf_counter() - t0) / reps


def session_health(mxu_n: int = 8192, hbm_mwords: int = 128) -> dict:
    """Three micro-probes that classify a slow session before any big run
    (505M builds varied 41-94 s across sessions with the same binary —
    round-3 diagnosis): per-dispatch round-trip latency through the
    tunnel, MXU rate (bf16 ``mxu_n``-square matmul chain), and HBM rate
    (elementwise pass over ``hbm_mwords`` Mi int32 words, 512 MB at the
    default). A slow session with NORMAL device rates is transport;
    abnormal rates here are the device (thermal/contention). Healthy v5e
    reference points at the defaults: dispatch 2.5-36 ms
    (session-dependent), MXU ~106-117 Tflop/s, HBM ~180-216 GB/s via
    tunnel. The size knobs exist so CPU tests can smoke the probe."""
    import jax.numpy as jnp

    x = jnp.zeros(8, jnp.int32)
    f = jax.jit(lambda a: a + 1)
    int(np.asarray(f(x)[0]))
    t0 = time.perf_counter()
    for _ in range(20):
        int(np.asarray(f(x)[0]))
    dispatch_ms = (time.perf_counter() - t0) / 20 * 1e3

    a = jax.jit(lambda: jnp.ones((mxu_n, mxu_n), jnp.bfloat16))()

    @jax.jit
    def mm(a):
        def body(i, acc):
            return jnp.dot(acc, a, preferred_element_type=jnp.bfloat16) * 0.5
        return jax.lax.fori_loop(0, 8, body, a)

    int(np.asarray(mm(a)[0, 0] * 0))
    t0 = time.perf_counter()
    int(np.asarray(mm(a)[0, 0] * 0))
    mxu_tflops = 8 * 2 * mxu_n**3 / (time.perf_counter() - t0) / 1e12

    big = jax.jit(lambda: jnp.ones(hbm_mwords * 1024 * 1024, jnp.int32))()

    @jax.jit
    def ew(b):
        def body(i, acc):
            return acc * 3 + i
        return jax.lax.fori_loop(0, 8, body, b)

    int(np.asarray(ew(big)[0] * 0))
    t0 = time.perf_counter()
    int(np.asarray(ew(big)[0] * 0))
    hbm_gbps = 8 * 2 * big.size * 4 / (time.perf_counter() - t0) / 1e9
    del a, big
    return {
        "dispatch_roundtrip_ms": round(dispatch_ms, 2),
        "mxu_tflops_bf16": round(mxu_tflops, 1),
        "hbm_gbps": round(hbm_gbps, 1),
    }


@dataclass
class Roofline:
    bytes_touched: int
    seconds_at_light: float
    measured_seconds: float

    @property
    def fraction_of_light(self) -> float:
        return self.seconds_at_light / max(self.measured_seconds, 1e-12)


def query_roofline(n_queries: int, k: int, measured_seconds: float,
                   hbm_bw: float = DEFAULT_HBM_BW, cache_k: int = 0) -> Roofline:
    """Bytes model for batched count_kmer on the packed index: per LF step,
    two ranks, each ONE 128-byte packed row gather (ops.packed_rank); a
    prefix cache skips the first ``cache_k`` steps.

    >>> r = query_roofline(1_000_000, k=21, measured_seconds=0.1,
    ...                    hbm_bw=800e9)
    >>> r.bytes_touched            # 21 steps x 2 ranks x 128 B per query
    5376000000
    >>> 0 < r.fraction_of_light < 1
    True
    """
    steps = max(k - cache_k, 0)
    bytes_touched = n_queries * (steps * 2 * 128 + (8 if cache_k else 0))
    return Roofline(bytes_touched, bytes_touched / hbm_bw, measured_seconds)


def pair_query_roofline(n_queries: int, k: int, measured_seconds: float,
                        cache_k: int = 0, row_bytes: int = 240,
                        hbm_bw: float = DEFAULT_HBM_BW) -> Roofline:
    """Bytes model for batched count_kmer on the 2-step PAIR index
    (ops.pair_rank): each round consumes TWO pattern symbols with two row
    gathers (both range ends), plus one single-symbol round for an odd
    tail — i.e. ``ceil((k - cache_k) / 2)`` rounds x 2 gathers x
    ``row_bytes`` (240 B compact rows by default; 512 B legacy). A prefix
    cache seeds the first ``cache_k`` symbols with one 8-byte lookup.

    Queries at this scale are gather-LATENCY/throughput bound, not
    stream-bandwidth bound (BASELINE.md: random 240-512 B rows gather at
    ~46-52 GB/s, ~4x below the sequential-stream rate), so fractions of
    light well below 1 are expected and the model deliberately uses the
    SPEC bandwidth — the gap to 1.0 is the price of random access.

    >>> r = pair_query_roofline(1_000_000, k=21, measured_seconds=0.1,
    ...                         cache_k=9, hbm_bw=800e9)
    >>> r.bytes_touched        # ceil(12/2)=6 rounds x 2 x 240 B + 8 B
    2888000000
    >>> 0 < r.fraction_of_light < 1
    True
    """
    rounds = -(-max(k - cache_k, 0) // 2)
    bytes_touched = n_queries * (rounds * 2 * row_bytes + (8 if cache_k else 0))
    return Roofline(bytes_touched, bytes_touched / hbm_bw, measured_seconds)


def build_roofline(n_symbols: int, max_read_len: int, measured_seconds: float,
                   hbm_bw: float = DEFAULT_HBM_BW) -> Roofline:
    """Bytes model for the Pallas BCR engine: each of ~max_read_len stages
    streams the int32 phys buffer through the merge kernel (window read ~5B +
    out write 4B per symbol), the packed shift/value stream (write+read, 8B),
    its scatter/matmul prep (~8B) and the rank-table rebuild (~8B)."""
    bytes_touched = (max_read_len + 1) * n_symbols * (5 + 4 + 8 + 8 + 8)
    return Roofline(bytes_touched, bytes_touched / hbm_bw, measured_seconds)
