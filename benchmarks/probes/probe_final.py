import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
import jax.numpy as jnp
from rust_msbwt_tpu.ops.bcr import build_msbwt
from rust_msbwt_tpu.ops.rank import build_kmer_cache, build_occ_index
from rust_msbwt_tpu.ops.pair_rank import build_pair_index, _count_kmers_pair_impl

def sync(x): return int(np.asarray(x.ravel()[:1])[0])

rng = np.random.default_rng(0x505)
genome = rng.integers(1, 6, size=4_600_000).astype(np.uint8)
n_reads = 5_000_000
starts = rng.integers(0, genome.size - 100, n_reads)
reads = np.stack([genome[s:s+100] for s in starts])
lengths = np.full(n_reads, 100, dtype=np.int32)
d = build_msbwt(reads, lengths, device_out=True); sync(d)
idx = build_occ_index(d)
pr = build_pair_index(idx); sync(pr.table2)
print("index ready", flush=True)

# (a) raw dependent row gathers at the pair table size (row bytes derived
# from the actual shape/dtype so the GB/s label can't drift from layout)
rows = pr.table2.shape[0]
row_bytes = int(pr.table2.shape[1]) * pr.table2.dtype.itemsize
B = 1_000_000
gidx = np.random.default_rng(1).integers(0, rows, B).astype(np.int32)
@jax.jit
def gather_rounds(table, idx0):
    def step(i, carry):
        acc, ix = carry
        r = jnp.take(table, ix, axis=0)        # [B, row] dependent gather
        acc = acc + r[:, 0]
        ix = (ix + r[:, 1] + i) % rows
        return acc, ix
    return jax.lax.fori_loop(0, 14, step, (jnp.zeros(B, jnp.int32), idx0))
out = gather_rounds(pr.table2, jnp.asarray(gidx)); sync(out[0])
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); out = gather_rounds(pr.table2, jnp.asarray(gidx)); sync(out[0])
    best = min(best, time.perf_counter() - t0)
print(f"raw {row_bytes}B-row gathers: {best/14/B*1e9:.1f} ns/row = "
      f"{14*B/best/1e6:.1f}M rows/s "
      f"= {14*B*row_bytes/best/1e9:.0f} GB/s", flush=True)

# (b) pair queries with 6^8 vs 6^10 seeds
cache8 = build_kmer_cache(idx.bwt, idx.occ, idx.starts, idx.n, 8); sync(cache8.lo)
rng2 = np.random.default_rng(0xFACE)
rq = rng2.integers(0, n_reads, B); offs = rng2.integers(0, 80, B)
kmers = reads[rq[:, None], offs[:, None] + np.arange(21)[None, :]].astype(np.uint8)
km_d = jnp.asarray(kmers); ql_d = jnp.asarray(np.full(B, 21, np.int32))
def run(cache, ck):
    return _count_kmers_pair_impl(pr.table2, pr.starts, pr.dmat, pr.n, km_d, ql_d, cache, ck)
o8 = run(cache8, 8); sync(o8)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); o = run(cache8, 8); sync(o); best = min(best, time.perf_counter()-t0)
print(f"pair cache_k=8:  {B/best:,.0f} q/s", flush=True)
t0 = time.perf_counter()
cache10 = build_kmer_cache(idx.bwt, idx.occ, idx.starts, idx.n, 10); sync(cache10.lo)
print(f"cache 6^10 build: {time.perf_counter()-t0:.1f}s", flush=True)
o10 = run(cache10, 10); sync(o10)
assert np.array_equal(np.asarray(o8), np.asarray(o10))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); o = run(cache10, 10); sync(o); best = min(best, time.perf_counter()-t0)
print(f"pair cache_k=10: {B/best:,.0f} q/s", flush=True)
