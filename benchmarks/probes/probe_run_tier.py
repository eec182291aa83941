"""Run-tier capacity demonstration: query a BWT whose DECODED device tiers
cannot fit on one chip.

Generates a high-compression BWT (mean run length ~40 — the 30x+ coverage
regime the msbwt exists for) with n ~ 2.0G symbols: the decoded+pair tiers
would need ~9 B/position = ~18 GB (> v5e's 16 GB HBM), while the run tier
needs 2.5 B/run + 0.07 B/position = ~0.3 GB. The BWT is synthesized directly
as runs (building it via BCR would itself exceed single-chip build buffers —
that scale builds on the sharded path), written as a standard npy, loaded
through ``RleBWT.load_numpy_file``, and queried batched; ranks are verified
against an exact host oracle (searchsorted over the run cumsum).

Usage:  python benchmarks/probes/probe_run_tier.py [n_billion_tenths]
        (default 20 -> n ~= 2.0e9 symbols)
"""

import sys
import time

import numpy as np


def main() -> int:
    tenths = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_target = tenths * 100_000_000

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_ab")

    from rust_msbwt_tpu.models.rle_bwt import RleBWT
    from rust_msbwt_tpu.ops.rle import bytes_from_runs
    from rust_msbwt_tpu.ops.run_rank import rank_runs
    from rust_msbwt_tpu.utils.npy import save_bwt_bytes

    rng = np.random.default_rng(0x20B)
    mean_run = 40
    n_runs = n_target // mean_run
    # maximal runs with NO two adjacent equal symbols (the byte-format
    # invariant — adjacent same-symbol runs would DECODE as one multi-digit
    # run): successive symbols differ by a random step in 1..5 mod 6, so
    # collisions are impossible by construction
    steps = rng.integers(1, 6, n_runs, dtype=np.int64)
    syms = (np.cumsum(steps) % 6).astype(np.uint8)
    lens = rng.geometric(1.0 / mean_run, n_runs).astype(np.int64)
    n = int(lens.sum())
    assert n < 2**31, n
    print(f"synthesized {n_runs:,} runs, n = {n:,} symbols "
          f"(mean run {n / n_runs:.1f})", flush=True)

    t0 = time.perf_counter()
    rle = bytes_from_runs(syms, lens.astype(np.uint64))
    path = "/tmp/run_tier_probe.npy"
    save_bwt_bytes(rle, path)
    print(f"npy written: {rle.size / 1e6:.0f} MB in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    bwt = RleBWT()
    bwt.load_numpy_file(path)
    t_load = time.perf_counter() - t0
    assert bwt.get_total_size() == n

    # decoded tiers CANNOT fit: record the arithmetic that routes to runs
    pair_bytes = 9 * n
    print(f"decoded+pair tiers would need {pair_bytes / 1e9:.1f} GB; "
          f"auto policy -> run tier", flush=True)

    t0 = time.perf_counter()
    B, K = 1_000_000, 21
    kmers = rng.integers(0, 6, size=(B, K)).astype(np.uint8)
    counts = bwt.count_kmers(kmers)
    t_first = time.perf_counter() - t0
    assert bwt._run_index is not None, "auto policy did not pick the run tier"
    ridx = bwt._run_index
    dev_bytes = ridx.device_bytes()
    print(f"run tier resident: {dev_bytes / 1e9:.3f} GB "
          f"({dev_bytes / n:.3f} B/position; decoded tiers would be "
          f"{pair_bytes / dev_bytes:.0f}x larger)", flush=True)
    print(f"load {t_load:.1f}s; first batched query (incl tier+cache build) "
          f"{t_first:.1f}s", flush=True)

    # steady-state query rate
    t0 = time.perf_counter()
    counts2 = bwt.count_kmers(kmers)
    t_q = time.perf_counter() - t0
    assert np.array_equal(counts, counts2)
    print(f"steady queries: {B / t_q / 1e6:.2f}M q/s "
          f"(1M x {K}-mers in {t_q:.2f}s)", flush=True)

    # exact host oracle on sampled ranks: occ(sym, pos) via searchsorted
    ends = np.cumsum(lens)
    starts_pos = ends - lens
    occ_cum = {}
    for s in range(6):
        sel = syms == s
        occ_cum[s] = (np.cumsum(np.where(sel, lens, 0)), sel)
    n_check = 2000
    pos = rng.integers(0, n + 1, n_check).astype(np.int64)
    qsym = rng.integers(0, 6, n_check).astype(np.int32)
    want = np.empty(n_check, np.int64)
    for i in range(n_check):
        r = int(np.searchsorted(ends, pos[i], side="right"))
        cum, sel = occ_cum[int(qsym[i])]
        base = int(cum[r - 1]) if r else 0
        part = 0
        if r < n_runs and sel[r]:
            part = int(pos[i] - starts_pos[r])
        want[i] = base + part
    got = np.asarray(
        rank_runs(ridx.table, ridx.seek, qsym, pos.astype(np.int32))
    )
    ok = np.array_equal(got, want)
    print(f"rank oracle check ({n_check} sampled): "
          f"{'EXACT' if ok else 'MISMATCH'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
