"""North-star benchmark: batched k-mer count queries/s on one chip.

Dataset: 10,000 simulated 100bp reads (seeded) — the BASELINE.json
"10k simulated reads" config. The flagship op is batched ``count_kmer``
backward search over the device occurrence index; the secondary metric is
BWT construction throughput (Mbases/s) through the batched BCR builder.

``vs_baseline`` compares against a sequential host implementation of the
reference's query loop (the reference publishes no numbers and Rust is not
available in this image — see BASELINE.md; the host loop is our Python
re-implementation of RleBWT::constrain_range semantics, measured here).

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_reads(n_reads=10_000, read_len=100, seed=0xBEEF):
    rng = np.random.default_rng(seed)
    # genome-derived reads so k-mer queries hit real repeat structure
    genome = rng.integers(1, 6, size=200_000).astype(np.uint8)
    starts = rng.integers(0, genome.size - read_len, n_reads)
    reads = np.stack([genome[s : s + read_len] for s in starts])
    lengths = np.full(n_reads, read_len, dtype=np.int32)
    return reads, lengths


def make_queries(reads, n_queries=1_000_000, k=21, seed=0xFACE):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, reads.shape[0], n_queries)
    offs = rng.integers(0, reads.shape[1] - k + 1, n_queries)
    return reads[rows[:, None], offs[:, None] + np.arange(k)[None, :]]


def main():
    import jax

    try:  # persistent compile cache: the BCR loop compile dominates cold runs
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    from rust_msbwt_tpu.ops.bcr import build_msbwt
    from rust_msbwt_tpu.ops.packed_rank import _count_kmers_packed_impl, pack_index
    from rust_msbwt_tpu.ops.rank import build_occ_index

    dev = jax.devices()[0]
    log(f"device: {dev}")

    reads, lengths = make_reads()
    n_bases = int(lengths.sum())

    # --- build (secondary metric) ---
    t0 = time.perf_counter()
    decoded = build_msbwt(reads, lengths, device_out=True)
    int(np.asarray(decoded[:1])[0])  # force sync (axon block_until_ready lies)
    build_compile_s = time.perf_counter() - t0
    build_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        decoded = build_msbwt(reads, lengths, device_out=True)
        int(np.asarray(decoded[:1])[0])
        build_s = min(build_s, time.perf_counter() - t0)
    build_mbases_s = n_bases / build_s / 1e6
    log(f"build: {build_s:.3f}s steady ({build_compile_s:.1f}s incl compile) "
        f"-> {build_mbases_s:.2f} Mbases/s, BWT size {decoded.size}")

    index = build_occ_index(jnp.asarray(decoded))
    decoded = np.asarray(decoded)  # host copy for the RLE/golden host paths

    # secondary build config: 100k reads (10.1M symbols) — a scaling point
    reads2, lengths2 = make_reads(n_reads=100_000, seed=0xF00D)
    d2 = build_msbwt(reads2, lengths2, device_out=True)
    int(np.asarray(d2[:1])[0])
    t0 = time.perf_counter()
    d2 = build_msbwt(reads2, lengths2, device_out=True)
    int(np.asarray(d2[:1])[0])
    build100k_s = time.perf_counter() - t0
    build100k_mbases_s = float(lengths2.sum()) / build100k_s / 1e6
    log(f"build 100k reads: {build100k_s:.2f}s -> {build100k_mbases_s:.1f} Mbases/s")
    del d2
    pidx = pack_index(index)

    from rust_msbwt_tpu.ops.rank import build_kmer_cache

    CACHE_K = 8
    t0 = time.perf_counter()
    cache = build_kmer_cache(index.bwt, index.occ, index.starts, index.n, CACHE_K)
    cache.block_until_ready()
    log(f"kmer cache (6^{CACHE_K} ranges): {time.perf_counter() - t0:.2f}s")

    # --- query (north star) ---
    K = 21
    kmers = make_queries(reads, k=K)
    B = kmers.shape[0]
    qlens = np.full(B, K, dtype=np.int32)
    kmers_d = jnp.asarray(kmers)
    qlens_d = jnp.asarray(qlens)

    def run_queries():
        return _count_kmers_packed_impl(pidx.table, pidx.starts, pidx.n,
                                        kmers_d, qlens_d, cache, CACHE_K)

    out = run_queries()
    int(np.asarray(out[0]))  # compile + warmup; forces device sync (axon
    # block_until_ready returns before execution completes — measured)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_queries()
    int(np.asarray(out[0]))
    query_s = (time.perf_counter() - t0) / reps
    qps = B / query_s
    counts = np.asarray(out)
    log(f"query: {B} x {K}-mers in {query_s * 1e3:.2f} ms -> {qps:,.0f} q/s "
        f"(mean count {counts.mean():.2f}, nonzero {(counts > 0).mean():.2%})")

    # --- native CPU baseline: the reference's exact sequential algorithms in
    # C++ (csrc/msbwt_baseline.cpp — B+-tree sorted insertion + occ-bin-seeded
    # RLE-decode query loop). This is the honest Rust-class number vs_baseline
    # compares against (Rust itself is unavailable in this image).
    from rust_msbwt_tpu.ops.rle import bytes_from_runs, runs_from_symbols
    from rust_msbwt_tpu.utils.native import (
        baseline_build_native, baseline_count_kmers_native,
    )

    rle = bytes_from_runs(*runs_from_symbols(decoded))
    n_cpu = 200_000
    t0 = time.perf_counter()
    cpu_counts = baseline_count_kmers_native(rle, kmers[:n_cpu], threads=1)
    cpu_s = time.perf_counter() - t0
    if cpu_counts is None:  # no toolchain: slow Python fallback, tiny sample
        from rust_msbwt_tpu.models.rle_bwt import RleBWT

        host = RleBWT()
        host.load_vector(rle)
        n_cpu = 2_000
        t0 = time.perf_counter()
        cpu_counts = np.array([host.count_kmer(kmers[i]) for i in range(n_cpu)])
        cpu_s = time.perf_counter() - t0
        baseline_kind = "python-fallback"
    else:
        baseline_kind = "native-cpp-1thread"
    cpu_qps = n_cpu / cpu_s
    assert cpu_counts.tolist() == counts[:n_cpu].tolist(), \
        "device/baseline count mismatch"
    log(f"native baseline ({baseline_kind}): {cpu_qps:,.0f} q/s ({n_cpu} queries)")

    # baseline build throughput on the same 10k-read config
    t0 = time.perf_counter()
    # slice rows to true lengths — padded tails would corrupt the baseline
    base_dec = baseline_build_native(
        [reads[i, : lengths[i]] for i in range(reads.shape[0])],
        sorted_insert=True,
    )
    base_build_s = time.perf_counter() - t0
    base_build_mbases = (
        n_bases / base_build_s / 1e6 if base_dec is not None else None
    )
    if base_dec is not None:
        assert np.array_equal(base_dec, decoded), "baseline/TPU build mismatch"
        log(f"native baseline build: {base_build_s:.2f}s "
            f"-> {base_build_mbases:.2f} Mbases/s (exact match)")

    print(json.dumps({
        "metric": "kmer count queries/s/chip (1M x 21-mers, 10k x 100bp reads)",
        "value": round(qps),
        "unit": "queries/s",
        "vs_baseline": round(qps / cpu_qps, 2),
        "extra": {
            "build_mbases_per_s": round(build_mbases_s, 3),
            "build_seconds": round(build_s, 3),
            "build_100k_reads_mbases_per_s": round(build100k_mbases_s, 3),
            "build_vs_baseline": (
                round(build_mbases_s / base_build_mbases, 2)
                if base_build_mbases else None
            ),
            "baseline_query_qps": round(cpu_qps),
            "baseline_build_mbases_per_s": (
                round(base_build_mbases, 3) if base_build_mbases else None
            ),
            "bwt_symbols": int(decoded.size),
            "query_batch": B,
            "k": K,
            "baseline_note": "C++ implementation of the reference's exact "
                             "sequential query loop and B+-tree builder, "
                             "single-threaded (csrc/msbwt_baseline.cpp)",
        },
    }))


if __name__ == "__main__":
    if "--no-retry" in sys.argv:
        main()
        sys.exit(0)
    try:
        main()
    except Exception as e:  # transient TPU-worker hiccups poison a process;
        # one clean retry in a subprocess usually succeeds
        import subprocess
        import sys

        log(f"bench attempt failed ({type(e).__name__}: {e}); retrying once")
        r = subprocess.run(
            [sys.executable, __file__, "--no-retry"],
            env={**__import__("os").environ},
        )
        sys.exit(r.returncode)
