"""Attribute the merge pass's 505M bandwidth gap: size sweep of the kernel
ALONE, then of the full stage step.

At 16M capacity the Pallas merge pass runs ~110 GB/s; at 505M the measured
stage-split says ~33 GB/s (ops/pallas_merge.py:73-75). Three hypotheses:
  (a) grid-step overhead (~290 ns/chunk) — would show as a flat ns/chunk
      floor in the kernel-only sweep, shrinking with MERGE_CS,
  (b) dynamic-start window-DMA latency over a multi-GB buffer — would show
      as a per-chunk cost GROWING with buffer size in the kernel-only sweep
      and shrinking with MSBWT_TPU_DMA_DEPTH,
  (c) the XLA prep passes around the kernel (ins scatter, tmap matmuls,
      ti pack) — would show as a gap between the kernel-only and the
      full-stage rows at the same capacity.

Usage (each import-frozen knob needs its own process):
  python benchmarks/probes/probe_merge_scale.py [sizes_M ...]
  MSBWT_TPU_MERGE_CS=256 python benchmarks/probes/probe_merge_scale.py
  MSBWT_TPU_DMA_DEPTH=8  python benchmarks/probes/probe_merge_scale.py

Prints one line per (capacity, variant): ms, GB/s (12-byte/position kernel
traffic model: ti 4 + old 4 + out 4; the 64-lane table adds ~0.5), and
ns/chunk.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    sizes_m = [int(x) for x in sys.argv[1:]
               if not x.startswith("-")] or [16, 64, 256, 505]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_ab")

    from rust_msbwt_tpu.ops.pallas_merge import (
        CHUNK,
        CS,
        DMA_DEPTH,
        _PAD,
        _merge_call,
        merge_insert_phys,
        to_phys,
    )

    print(f"CS={CS} CHUNK={CHUNK} DMA_DEPTH={DMA_DEPTH}", flush=True)
    rng = np.random.default_rng(0x5CA1E)

    def sync(x):
        return int(np.asarray(x.ravel()[:1])[0])

    for size_m in sizes_m:
        n_cap = size_m * 1_000_000
        # a realistic stage: ~81 insertions per CS=64 chunk at the 505M
        # config -> insertion density ~1/100 (one new symbol per read per
        # stage at 100bp reads)
        n_ins = max(1, n_cap // 100)
        n_old = n_cap - n_ins
        old_log = np.full(n_cap, _PAD, np.int32)
        old_log[:n_old] = rng.integers(0, 6, n_old).astype(np.int32)
        phys = to_phys(jnp.asarray(old_log), n_cap)
        q = np.sort(rng.choice(n_cap, n_ins, replace=False)).astype(np.int32)
        v = rng.integers(0, 6, n_ins).astype(np.int32)
        qd, vd = jnp.asarray(q), jnp.asarray(v)
        act = jnp.ones(n_ins, bool)

        # --- full stage step (prep + kernel) ---
        full = jax.jit(lambda p, q, v, a: merge_insert_phys(p, q, v, a)[0])
        sync(full(phys, qd, vd, act))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = full(phys, qd, vd, act)
        sync(out)
        t_full = (time.perf_counter() - t0) / reps

        # --- kernel only (prep precomputed once) ---
        rows = phys.shape[0]
        total = rows * 128
        ins = (
            jnp.zeros(total, jnp.int8)
            .at[jnp.asarray(q) + CHUNK]
            .set(vd.astype(jnp.int8) + 1, mode="drop")
            .reshape(rows, 128)
        )
        from rust_msbwt_tpu.ops.pallas_merge import _tmap_from_delta

        tmap = jax.jit(_tmap_from_delta)((ins > 0).astype(jnp.int32))
        ends = tmap[CS - 1 :: CS, 127]
        chunk_a = jnp.concatenate([jnp.zeros(1, jnp.int32), ends])
        ti = jax.jit(lambda t, i: (t << 3) | i.astype(jnp.int32))(tmap, ins)
        kern = jax.jit(lambda ca, op, ti: _merge_call(ca, op, ti)[0])
        sync(kern(chunk_a, phys, ti))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = kern(chunk_a, phys, ti)
        sync(out)
        t_kern = (time.perf_counter() - t0) / reps

        n_chunks = total // CHUNK
        bytes_kernel = 12 * total  # ti + old + out, int32 rows
        print(
            f"cap={size_m:>4}M kernel {t_kern*1e3:8.1f} ms "
            f"({bytes_kernel / t_kern / 1e9:6.1f} GB/s, "
            f"{t_kern / n_chunks * 1e9:7.0f} ns/chunk) | "
            f"full stage {t_full*1e3:8.1f} ms "
            f"({bytes_kernel / t_full / 1e9:6.1f} GB/s) | "
            f"prep overhead {(t_full - t_kern)*1e3:7.1f} ms",
            flush=True,
        )

        if "--prep" in sys.argv:
            # break the prep down: which pass eats the 505M overhead?
            def timeit(f, *args, label=""):
                sync(f(*args))
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = f(*args)
                sync(out)
                dt = (time.perf_counter() - t0) / reps
                print(f"    prep[{label}] {dt*1e3:8.2f} ms", flush=True)
                return dt

            qp = qd + CHUNK
            v8 = vd.astype(jnp.int8)

            def scat_plain(qp, v8):
                return (jnp.zeros(total, jnp.int8).at[qp]
                        .set(v8 + 1, mode="drop").reshape(rows, 128))

            def scat_sorted(qp, v8):
                return (jnp.zeros(total, jnp.int8).at[qp]
                        .set(v8 + 1, mode="drop", indices_are_sorted=True,
                             unique_indices=True).reshape(rows, 128))

            def scat_sorted_i32(qp, vd):
                return (jnp.zeros(total, jnp.int32).at[qp]
                        .set(vd + 1, mode="drop", indices_are_sorted=True,
                             unique_indices=True).reshape(rows, 128))

            timeit(jax.jit(scat_plain), qp, v8, label="ins scatter (plain)")
            timeit(jax.jit(scat_sorted), qp, v8,
                   label="ins scatter (sorted+unique)")
            timeit(jax.jit(scat_sorted_i32), qp, vd,
                   label="ins scatter i32 (sorted+unique)")
            timeit(jax.jit(_tmap_from_delta), (ins > 0).astype(jnp.int32),
                   label="tmap two-level cumsum")
            timeit(jax.jit(lambda t, i: (t << 3) | i.astype(jnp.int32)),
                   tmap, ins, label="ti pack")
    return 0


if __name__ == "__main__":
    sys.exit(main())
