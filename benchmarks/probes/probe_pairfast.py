"""Probe: pair-stream flat n-gather vs row-gather variant at 505M on TPU."""
import os, sys, time
sys.path.insert(0, "/root/repo")  # runnable as a script
import numpy as np
import jax
import jax.numpy as jnp

sys.stdout.reconfigure(line_buffering=True)
print("devices:", jax.devices())

from rust_msbwt_tpu.ops.rank import build_occ_index, BIN
from rust_msbwt_tpu.ops import pair_rank as pr

N = int(sys.argv[1]) if len(sys.argv) > 1 else 505_000_000
rng = np.random.default_rng(0)
bwt = rng.integers(0, 6, N, dtype=np.uint8)

t0 = time.time()
idx = build_occ_index(jnp.asarray(bwt))
jax.block_until_ready(idx.occ)
_ = int(np.asarray(idx.occ[0, 0]))
print(f"occ index build: {time.time()-t0:.2f}s  n={idx.n}")


def timeit(fn, label, reps=3):
    t0 = time.time()
    out = fn()
    _ = int(np.asarray(out[0]))
    compile_s = time.time() - t0
    times = []
    for _r in range(reps):
        t0 = time.time()
        out = fn()
        _ = int(np.asarray(out[0]))
        times.append(time.time() - t0)
    print(f"{label}: first {compile_s:.2f}s, steady {sorted(times)[len(times)//2]:.3f}s  (all: {[f'{t:.3f}' for t in times]})")
    return out


flat = timeit(lambda: pr._build_pair_stream_flat(idx.bwt, idx.occ, idx.starts, n=idx.n), "flat")
fast = timeit(lambda: pr._build_pair_stream_rowgather(idx.bwt, idx.occ, idx.starts, n=idx.n), "rowgather")

eq = bool(np.asarray(jnp.array_equal(flat, fast)))
print("EQUAL:", eq)
