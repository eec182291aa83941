"""BCR pallas-engine parity + perf on TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from rust_msbwt_tpu.ops.bcr import build_msbwt, encode_reads

rng = np.random.default_rng(123)

# parity on small random read sets (vs xla engine, already oracle-validated)
for trial in range(4):
    n_reads = int(rng.integers(2, 40))
    reads_l = [rng.integers(1, 6, rng.integers(1, 30)).astype(np.uint8)
               for _ in range(n_reads)]
    reads, lengths = encode_reads(reads_l)
    for sorted_insert in (True, False):
        a = build_msbwt(reads, lengths, sorted_insert, engine="xla")
        b = build_msbwt(reads, lengths, sorted_insert, engine="pallas")
        assert np.array_equal(a, b), (trial, sorted_insert)
print("parity small: OK")

# extend-flow parity
base_reads, base_lens = encode_reads([rng.integers(1,6,20).astype(np.uint8) for _ in range(8)])
base = build_msbwt(base_reads, base_lens, True, engine="xla")
new_reads, new_lens = encode_reads([rng.integers(1,6,15).astype(np.uint8) for _ in range(5)])
a = build_msbwt(new_reads, new_lens, True, base=base, base_string_count=8, engine="xla")
b = build_msbwt(new_reads, new_lens, True, base=base, base_string_count=8, engine="pallas")
assert np.array_equal(a, b)
print("parity extend: OK")

# perf: bench shape 10k x 100bp
def make_reads(n_reads=10_000, read_len=100, seed=0xBEEF):
    r = np.random.default_rng(seed)
    genome = r.integers(1, 6, size=200_000).astype(np.uint8)
    starts = r.integers(0, genome.size - read_len, n_reads)
    reads = np.stack([genome[s:s+read_len] for s in starts])
    return reads, np.full(n_reads, read_len, np.int32)

for n_reads in (10_000, 100_000):
    reads, lengths = make_reads(n_reads)
    n_bases = int(lengths.sum())
    for eng in (("xla",) if n_reads <= 10_000 else ()) + ("pallas",):
        out = build_msbwt(reads, lengths, engine=eng)  # compile+run
        t0 = time.perf_counter()
        out2 = build_msbwt(reads, lengths, engine=eng)
        dt = time.perf_counter() - t0
        print(f"build {n_reads} reads engine={eng}: {dt*1e3:.0f} ms -> "
              f"{n_bases/dt/1e6:.1f} Mbases/s (bwt {out2.size})")
        if eng == "pallas" and n_reads == 10_000:
            assert np.array_equal(out_x, out2), "pallas != xla at 10k"
        if eng == "xla":
            out_x = out2
