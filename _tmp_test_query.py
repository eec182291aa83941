"""Query perf on TPU: baseline vs packed rank, cache_k sweep."""
import time
import numpy as np
import jax, jax.numpy as jnp
from rust_msbwt_tpu.ops.bcr import build_msbwt
from rust_msbwt_tpu.ops.rank import (build_occ_index, _count_kmers_impl,
                                     build_kmer_cache)
from rust_msbwt_tpu.ops.packed_rank import pack_index, _count_kmers_packed_impl

def make_reads(n_reads=10_000, read_len=100, seed=0xBEEF):
    r = np.random.default_rng(seed)
    genome = r.integers(1, 6, size=200_000).astype(np.uint8)
    starts = r.integers(0, genome.size - read_len, n_reads)
    return np.stack([genome[s:s+read_len] for s in starts]), np.full(n_reads, read_len, np.int32)

def make_queries(reads, n=1_000_000, k=21, seed=0xFACE):
    r = np.random.default_rng(seed)
    rows = r.integers(0, reads.shape[0], n)
    offs = r.integers(0, reads.shape[1] - k + 1, n)
    return reads[rows[:, None], offs[:, None] + np.arange(k)[None, :]]

reads, lengths = make_reads()
decoded = build_msbwt(reads, lengths, engine="pallas")
index = build_occ_index(jnp.asarray(decoded))
pidx = pack_index(index)
K = 21
kmers = make_queries(reads, k=K)
B = kmers.shape[0]
qlens = np.full(B, K, np.int32)
kd, qd = jnp.asarray(kmers), jnp.asarray(qlens)

def bench(name, fn):
    out = fn(); s0 = int(np.asarray(out[:3]).sum())
    t0 = time.perf_counter()
    out = fn()
    int(np.asarray(out[0]))
    dt = time.perf_counter() - t0
    print(f"{name:36s}: {dt*1e3:8.1f} ms -> {B/dt/1e6:6.2f} M q/s")
    return np.asarray(out)

base = None
for ck in (0, 8, 9):
    cache = None
    if ck:
        t0 = time.perf_counter()
        cache = build_kmer_cache(index.bwt, index.occ, index.starts, index.n, ck)
        int(np.asarray(cache[0,0])); print(f"  cache k={ck} build: {time.perf_counter()-t0:.1f}s size {cache.shape[0]:,}")
    a = bench(f"baseline   cache_k={ck}",
              lambda: _count_kmers_impl(index.bwt, index.occ, index.starts, index.n, kd, qd, cache, ck))
    b = bench(f"packed     cache_k={ck}",
              lambda: _count_kmers_packed_impl(pidx.table, pidx.starts, pidx.n, kd, qd, cache, ck))
    assert np.array_equal(a, b), "packed mismatch"
    if base is None: base = a
    assert np.array_equal(a, base)
print("all equal: OK")
