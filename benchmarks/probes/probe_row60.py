"""Probe: pair query throughput, legacy 512B rows vs compact 240B rows.

Also reports the HBM bytes actually allocated for each table (via
device_memory_stats deltas when available) to confirm whether XLA stores
the [NB, 60] gather source dense or pads it.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")  # runnable as a script
import numpy as np
import jax
import jax.numpy as jnp

sys.stdout.reconfigure(line_buffering=True)
print("devices:", jax.devices())

from rust_msbwt_tpu.ops.rank import build_occ_index
from rust_msbwt_tpu.ops import pair_rank as pr

N = int(sys.argv[1]) if len(sys.argv) > 1 else 505_000_000
B, K = 1_000_000, 21
rng = np.random.default_rng(0)
bwt = rng.integers(0, 6, N, dtype=np.uint8)
idx = build_occ_index(jnp.asarray(bwt))
_ = int(np.asarray(idx.occ[0, 0]))
print(f"occ index ready n={idx.n}")

ps = pr._build_pair_stream(idx.bwt, idx.occ, idx.starts, n=idx.n)
_ = int(np.asarray(ps[0]))

kmers = jnp.asarray(rng.integers(0, 6, (B, K), dtype=np.uint8))
qlens = jnp.full(B, K, jnp.int32)
dmat = pr._build_dmat(idx.bwt, idx.occ, idx.starts)


def qps_of(table2, label):
    def run():
        return pr._count_kmers_pair_impl(table2, idx.starts, dmat, idx.n,
                                         kmers, qlens)
    out = run()
    _ = int(np.asarray(out[0]))
    reps = 3
    t0 = time.time()
    for _r in range(reps):
        out = run()
    _ = int(np.asarray(out[0]))
    dt = (time.time() - t0) / reps
    print(f"{label}: {B/dt/1e6:.2f}M q/s device ({dt*1e3:.0f} ms/batch)")
    return out


t128 = pr._build_pair_table(ps, lanes=128)
_ = int(np.asarray(t128[0, 0]))
o128 = qps_of(t128, "legacy 128-lane (512B rows)")

t60 = pr._build_pair_table(ps, lanes=60)
_ = int(np.asarray(t60[0, 0]))
o60 = qps_of(t60, "compact 60-lane (240B rows)")

eq = bool(np.asarray(jnp.array_equal(o128, o60)))
print("EQUAL:", eq)
