"""Standalone correctness + perf test for ops.pallas_merge on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from rust_msbwt_tpu.ops.pallas_merge import (
    CHUNK, merge_insert_phys, phys_rows, to_phys, from_phys, _PAD,
)

rng = np.random.default_rng(42)


def oracle(old, q, v, active):
    """numpy reference: insert values v at new-coordinate slots q."""
    q = q[active]; v = v[active]
    order = np.argsort(q)
    q, v = q[order], v[order]
    n_new = old.size + q.size
    out = np.full(n_new, -99, np.int32)
    out[q] = v
    mask = np.ones(n_new, bool)
    mask[q] = False
    out[mask] = old
    return out


def run_case(n_old, n_ins, n_cap, seed):
    r = np.random.default_rng(seed)
    old = r.integers(0, 6, n_old).astype(np.int32)
    # distinct new-coordinate slots in [0, n_old + n_ins)
    q = r.choice(n_old + n_ins, size=n_ins, replace=False).astype(np.int32)
    v = r.integers(0, 6, n_ins).astype(np.int32)
    active = np.ones(n_ins, bool)

    old_log = np.full(n_cap, _PAD, np.int32)
    old_log[:n_old] = old
    old_phys = to_phys(jnp.asarray(old_log), n_cap)
    new_phys, m = merge_insert_phys(old_phys, jnp.asarray(q), jnp.asarray(v),
                                    jnp.asarray(active))
    got = np.asarray(from_phys(new_phys, n_cap))
    want = oracle(old, q, v, active)
    ok = (got[:want.size] == want).all() and (got[want.size:] == _PAD).all()
    if not ok:
        bad = np.nonzero(got[:want.size] != want)[0]
        print(f"  FAIL n_old={n_old} n_ins={n_ins}: first bad at {bad[:5]}, "
              f"got {got[bad[:5]]}, want {want[bad[:5]]}")
    return ok


print("correctness:")
cases = [
    (0, 5, 100), (10, 1, 100), (100, 50, 200), (1000, 100, 2000),
    (CHUNK - 1, 3, 2 * CHUNK), (CHUNK, CHUNK, 3 * CHUNK),
    (5000, 2000, 10000), (3 * CHUNK, 1, 4 * CHUNK),
]
allok = True
for i, (n_old, n_ins, n_cap) in enumerate(cases):
    ok = run_case(n_old, n_ins, n_cap, seed=i)
    allok &= ok
    print(f"  case n_old={n_old} n_ins={n_ins} n_cap={n_cap}: {'OK' if ok else 'FAIL'}")

# clustered insertions (all q consecutive -> one chunk saturated)
def run_clustered(seed=99):
    r = np.random.default_rng(seed)
    n_old, n_ins = 10000, CHUNK
    n_cap = n_old + n_ins
    old = r.integers(0, 6, n_old).astype(np.int32)
    start = 5000
    q = (start + np.arange(n_ins)).astype(np.int32)
    v = r.integers(0, 6, n_ins).astype(np.int32)
    active = np.ones(n_ins, bool)
    old_log = np.full(n_cap, _PAD, np.int32); old_log[:n_old] = old
    old_phys = to_phys(jnp.asarray(old_log), n_cap)
    new_phys, _ = merge_insert_phys(old_phys, jnp.asarray(q), jnp.asarray(v),
                                    jnp.asarray(active))
    got = np.asarray(from_phys(new_phys, n_cap))
    want = oracle(old, q, v, active)
    return (got[:want.size] == want).all()

ok = run_clustered()
allok &= ok
print(f"  clustered (full-chunk insertions): {'OK' if ok else 'FAIL'}")

# inactive mask
def run_masked(seed=7):
    r = np.random.default_rng(seed)
    n_old, n_ins, n_cap = 2000, 100, 3000
    old = r.integers(0, 6, n_old).astype(np.int32)
    active = r.random(n_ins) < 0.5
    m = active.sum()
    q = r.choice(n_old + m, size=n_ins, replace=False).astype(np.int32)
    v = r.integers(0, 6, n_ins).astype(np.int32)
    old_log = np.full(n_cap, _PAD, np.int32); old_log[:n_old] = old
    old_phys = to_phys(jnp.asarray(old_log), n_cap)
    new_phys, mm = merge_insert_phys(old_phys, jnp.asarray(q), jnp.asarray(v),
                                     jnp.asarray(active))
    got = np.asarray(from_phys(new_phys, n_cap))
    want = oracle(old, q, v, active)
    return (got[:want.size] == want).all() and int(mm) == m

ok = run_masked()
allok &= ok
print(f"  masked insertions: {'OK' if ok else 'FAIL'}")

assert allok, "correctness failures"

# perf: 1M buffer, 10k insertions (the bench shape)
print("perf:")
for n_old, n_ins in [(1_000_000, 10_000), (16_000_000, 10_000), (100_000_000, 1_000_000)]:
    n_cap = n_old + n_ins
    old_log = jnp.asarray(rng.integers(0, 6, n_cap).astype(np.int32))  # cap-sized; treat all valid
    q = jnp.asarray(np.sort(rng.choice(n_cap, size=n_ins, replace=False)).astype(np.int32))
    v = jnp.asarray(rng.integers(0, 6, n_ins).astype(np.int32))
    active = jnp.ones(n_ins, bool)
    old_phys = to_phys(old_log, n_cap)
    import functools
    @jax.jit
    def step(old_phys, q, v, active):
        out, m = merge_insert_phys(old_phys, q, v, active)
        return out, jnp.sum(out[:, 0] & 0xff)  # force full dependency
    t0 = time.perf_counter()
    out, s_ = step(old_phys, q, v, active); int(s_)
    compile_s = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out, s_ = step(old_phys, q, v, active)
    int(s_)  # host transfer forces completion (block_until_ready lies on axon)
    dt = (time.perf_counter() - t0) / reps
    gbps = (n_cap * 4 * 3) / dt / 1e9  # old read + out write + tmap-ish
    print(f"  n={n_cap:>11,} ins={n_ins:>9,}: {dt*1e3:8.2f} ms/pass "
          f"(compile {compile_s:.1f}s) ~{gbps:.0f} GB/s effective")
