"""Probe: build throughput vs bucket growth factor (steady-state A/B).

Runs in ONE process; the growth env is read per build call (schedule is
host-side). Each arm: 1 compile call + timed reps.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")  # runnable as a script
import numpy as np

sys.stdout.reconfigure(line_buffering=True)
import jax
print("devices:", jax.devices())
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from rust_msbwt_tpu.ops.bcr import build_msbwt

NR = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
L = 100
rng = np.random.default_rng(0xEC011)
genome = rng.integers(1, 6, size=4_600_000, dtype=np.uint8)
starts = rng.integers(0, genome.size - L, NR)
reads = genome[starts[:, None] + np.arange(L)[None, :]]
lengths = np.full(NR, L, np.int32)
nb = float(lengths.sum())

for growth in sys.argv[2].split(",") if len(sys.argv) > 2 else ["2", "1.3"]:
    os.environ["MSBWT_TPU_BUCKET_GROWTH"] = growth
    t0 = time.time()
    out = build_msbwt(reads, lengths, device_out=True)
    _ = int(np.asarray(out[:1])[0])
    first = time.time() - t0
    times = []
    for _r in range(2):
        t0 = time.time()
        out = build_msbwt(reads, lengths, device_out=True)
        _ = int(np.asarray(out[:1])[0])
        times.append(time.time() - t0)
    print(f"growth={growth}: steady {min(times):.2f}s "
          f"({nb/min(times)/1e6:.1f} Mbases/s; first incl compile {first:.1f}s; "
          f"all {[f'{t:.2f}' for t in times]})")
