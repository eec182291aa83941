"""Sweep MSBWT_TPU_MERGE_CS at scale (one subprocess per value — the
chunk size is frozen when ops.pallas_merge imports).

Motivation (ROADMAP "Merge chunk-size env"): CS=64 was chosen by a sweep
at 16M symbols where the merge pass runs ~110 GB/s; at 250M capacity the
same pass measures ~33 GB/s = ~4 us/chunk. If that is per-chunk overhead
(DMA issue latency over a large buffer), bigger chunks amortize it and
the pass — 82% of a build stage — could shrink several-fold.

Usage: python probe_merge_cs.py [n_reads] [read_len] [cs cs ...]
Defaults: 5_000_000 100 32 64 128 256. Each child builds once (compile)
plus REPS steady reps and prints the median steady build seconds.
"""
import os
import subprocess
import sys
import time

REPS = 3

if os.environ.get("_MSBWT_CS_CHILD") == "1":
    sys.stdout.reconfigure(line_buffering=True)
    n_reads, read_len = int(sys.argv[1]), int(sys.argv[2])
    import numpy as np

    sys.path.insert(0, "/root/repo")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_cs")
    from rust_msbwt_tpu.ops.bcr import build_msbwt

    rng = np.random.default_rng(0x505)
    genome = rng.integers(1, 6, size=4_600_000).astype(np.uint8)
    starts = rng.integers(0, genome.size - read_len, n_reads)
    reads = np.stack([genome[s : s + read_len] for s in starts])
    lengths = np.full(n_reads, read_len, dtype=np.int32)

    def sync(x):
        return int(np.asarray(x.ravel()[:1])[0])

    t0 = time.perf_counter()
    sync(build_msbwt(reads, lengths, device_out=True))
    print(f"  first (compile+run): {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(build_msbwt(reads, lengths, device_out=True))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    mbs = n_reads * (read_len + 1) / med / 1e6
    print(f"RESULT cs={os.environ['MSBWT_TPU_MERGE_CS']} "
          f"median={med:.2f}s ({mbs:.1f} Mbases/s) "
          f"all={[round(t, 2) for t in times]}", flush=True)
    sys.exit(0)

n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100
cs_list = [int(a) for a in sys.argv[3:]] or [32, 64, 128, 256]
print(f"merge-CS sweep: {n_reads} x {read_len}bp, CS in {cs_list}",
      flush=True)
for cs in cs_list:
    env = {**os.environ, "_MSBWT_CS_CHILD": "1",
           "MSBWT_TPU_MERGE_CS": str(cs)}
    print(f"--- CS={cs}", flush=True)
    r = subprocess.run(
        [sys.executable, __file__, str(n_reads), str(read_len)], env=env
    )
    if r.returncode != 0:
        print(f"  CS={cs} FAILED rc={r.returncode}", flush=True)
