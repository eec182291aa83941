"""On-device validation sweep: engine parity + golden roundtrip at real scale.

The pytest suite runs on a CPU mesh (tests/conftest.py); this script is the
TPU-side counterpart the driver/judge can run on real hardware:

  python -m benchmarks.validate_tpu          # ~2-4 min incl. compiles

Checks:
  1. pallas vs xla engine parity on random variable-length collections,
  2. pallas build vs naive oracle on a 32x-coverage mini-genome,
  3. 10k-read build -> RLE npy roundtrip -> packed-query parity with the
     sequential host loop (reference semantics) on sampled k-mers,
  4. extend flow (base + new batch) parity across engines,
  5. opt-in perf layouts on real hardware: pair-fast stream, 60-lane pair
     rows, bucket growth (in-process env), and — via subprocesses, because
     they are read at import — legacy 128-lane table rows, CS=32/64 merge
     chunks (64 was the default before the round-5 505M A/B moved it to
     128), and DMA depth 4. (The int16-phys and INS8 levers were measured
     and deleted in round 4 — BASELINE.md decision table.)

Prints PASS/FAIL per check; exits nonzero on any failure.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np


def _knob_child() -> int:
    """Small hardware parity drive for one import-time knob combination
    (env already set by the parent): pallas build + fused derivation vs
    the naive oracle."""
    import jax.numpy as jnp

    from rust_msbwt_tpu.ops.alphabet import convert_itos
    from rust_msbwt_tpu.ops.bcr import build_msbwt_with_index, encode_reads
    from rust_msbwt_tpu.ops.packed_rank import count_kmers_packed, pack_index
    from rust_msbwt_tpu.ops.rank import build_occ_index
    from rust_msbwt_tpu.utils.oracle import naive_bwt

    rng = np.random.default_rng(7)
    reads_l = [rng.integers(1, 6, rng.integers(5, 60)).astype(np.uint8)
               for _ in range(300)]
    reads, lens = encode_reads(reads_l)
    idx, packed = build_msbwt_with_index(reads, lens, engine="pallas")
    got = convert_itos(np.asarray(idx.bwt[: idx.n]))
    want = naive_bwt([convert_itos(r) for r in reads_l])
    if got != want:
        print("knob-child: BWT mismatch", flush=True)
        return 1
    w_idx = build_occ_index(jnp.asarray(np.asarray(idx.bwt[: idx.n])))
    kmers = rng.integers(1, 6, size=(200, 6)).astype(np.uint8)
    a = count_kmers_packed(packed, kmers)
    b = count_kmers_packed(pack_index(w_idx), kmers)
    if not np.array_equal(a, b):
        print("knob-child: query mismatch", flush=True)
        return 1
    return 0


def _rss_child(path: str, n_kmers: int = 200_000) -> int:
    """Measure peak HOST memory for ``load_numpy_file`` + the first batched
    query — the load-path contract (round-5): the host must not
    double-materialize the decoded BWT, so the RSS *increment* over the
    post-import baseline stays ~= the npy byte size (the reference's
    load-from-compressed scaling, ref: src/rle_bwt.rs:14-24,81-155).

    Run in a FRESH process (the parent launches it as a subprocess):
    ``ru_maxrss`` is a high-water mark, so pre-existing allocations would
    mask the measurement. Prints one JSON line."""
    import json
    import resource
    import time

    import jax

    try:  # persistent cache: a cacheless child recompiles the whole query
        # stack at 505M and blows its caller's timeout (round-5 bench)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    except Exception:
        pass

    from rust_msbwt_tpu.models.rle_bwt import RleBWT

    npy_bytes = os.path.getsize(path)
    base_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    bwt = RleBWT()
    bwt.load_numpy_file(path)
    t_load = time.perf_counter() - t0
    rng = np.random.default_rng(99)
    kmers = rng.integers(1, 6, size=(n_kmers, 21)).astype(np.uint8)
    t0 = time.perf_counter()
    counts = bwt.count_kmers(kmers)
    t_query = time.perf_counter() - t0
    peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    delta = (peak_kb - base_kb) * 1024
    out = {
        "npy_bytes": npy_bytes,
        "n_symbols": bwt.get_total_size(),
        "n_runs": bwt.n_runs,
        "rss_base_bytes": base_kb * 1024,
        "rss_peak_bytes": peak_kb * 1024,
        "rss_delta_bytes": delta,
        "rss_delta_over_npy": round(delta / max(npy_bytes, 1), 3),
        "load_s": round(t_load, 2),
        "first_query_s": round(t_query, 2),
        "count_checksum": int(np.sum(counts) % (1 << 31)),
    }
    print("RSS_RESULT " + json.dumps(out), flush=True)
    # contract: increment <= 1.2x the npy (plus a fixed 256 MB allowance for
    # jax/XLA runtime growth during the first device program)
    ok = delta <= 1.2 * npy_bytes + 256 * 2**20
    print("RSS " + ("PASS" if ok else "FAIL"), flush=True)
    return 0 if ok else 1


def main() -> int:
    import jax.numpy as jnp

    from rust_msbwt_tpu.models.rle_bwt import RleBWT
    from rust_msbwt_tpu.ops.alphabet import convert_itos
    from rust_msbwt_tpu.ops.bcr import build_msbwt, encode_reads
    from rust_msbwt_tpu.ops.packed_rank import count_kmers_packed, pack_index
    from rust_msbwt_tpu.ops.rank import build_occ_index
    from rust_msbwt_tpu.ops.rle import runs_from_symbols
    from rust_msbwt_tpu.utils.npy import save_bwt_runs
    from rust_msbwt_tpu.utils.oracle import naive_bwt

    failures = 0

    def check(name, ok):
        nonlocal failures
        print(f"[{'PASS' if ok else 'FAIL'}] {name}", flush=True)
        failures += 0 if ok else 1

    rng = np.random.default_rng(2024)

    # 1. engine parity, variable lengths
    for trial in range(3):
        reads_l = [rng.integers(1, 6, rng.integers(1, 60)).astype(np.uint8)
                   for _ in range(int(rng.integers(10, 200)))]
        reads, lens = encode_reads(reads_l)
        a = build_msbwt(reads, lens, engine="xla")
        b = build_msbwt(reads, lens, engine="pallas")
        check(f"engine parity trial {trial} (N={len(reads_l)})",
              np.array_equal(a, b))

    # 2. oracle, 32x coverage
    genome = rng.integers(1, 6, 56).astype(np.uint8)
    reads_l = []
    for _ in range(32):
        for s in range(0, 56 - 20, 7):
            reads_l.append(genome[s : s + 20])
    reads, lens = encode_reads(reads_l)
    got = build_msbwt(reads, lens, engine="pallas")
    check("32x-coverage oracle",
          convert_itos(got) == naive_bwt([convert_itos(r) for r in reads_l]))

    # 3. 10k-read roundtrip + query parity vs sequential host loop
    genome = rng.integers(1, 6, 100_000).astype(np.uint8)
    starts = rng.integers(0, genome.size - 100, 10_000)
    reads = np.stack([genome[s : s + 100] for s in starts])
    lens = np.full(10_000, 100, np.int32)
    decoded = build_msbwt(reads, lens, engine="pallas")
    with tempfile.NamedTemporaryFile(suffix=".npy") as tmp:
        save_bwt_runs(*runs_from_symbols(decoded), tmp.name)
        host = RleBWT()
        host.load_numpy_file(tmp.name)
        # 3f. load-path host-memory contract (fresh subprocess; the real
        # claim is measured at the 505M npy in the large bench session)
        try:
            r = subprocess.run(
                [sys.executable, "-m", "benchmarks.validate_tpu",
                 "--rss", tmp.name],
                timeout=1200, capture_output=True, text=True,
            )
            sys.stdout.write(r.stdout)
            check("load-path RSS contract (1M-symbol npy)", r.returncode == 0)
        except subprocess.TimeoutExpired:
            check("load-path RSS contract (1M-symbol npy)", False)
    check("10k roundtrip symbol counts",
          int(host.get_total_size()) == decoded.size)
    idx = build_occ_index(jnp.asarray(decoded))
    pidx = pack_index(idx)
    rows = rng.integers(0, 10_000, 64)
    offs = rng.integers(0, 80, 64)
    kmers = reads[rows[:, None], offs[:, None] + np.arange(21)[None, :]]
    dev = count_kmers_packed(pidx, kmers)
    seq = [host.count_kmer(k) for k in kmers]
    check("packed device counts == sequential host loop",
          dev.tolist() == seq)

    # 3b. merge-kernel randomized sweep on real hardware (fast + wide paths)
    from rust_msbwt_tpu.ops.pallas_merge import (
        _PAD,
        from_phys,
        merge_insert_phys,
        to_phys,
    )

    def merge_case(n_old, n_ins, seed):
        r = np.random.default_rng(seed)
        n_cap = n_old + n_ins
        old = r.integers(0, 6, n_old).astype(np.int32)
        q = np.sort(r.choice(n_cap, n_ins, replace=False)).astype(np.int32)
        v = r.integers(0, 6, n_ins).astype(np.int32)
        old_log = np.full(n_cap, _PAD, np.int32)
        old_log[:n_old] = old
        phys = to_phys(jnp.asarray(old_log), n_cap)
        new, _tab, _ = merge_insert_phys(
            phys, jnp.asarray(q), jnp.asarray(v), jnp.ones(n_ins, bool)
        )
        got = np.asarray(from_phys(new, n_cap))
        want = np.full(n_cap, -1, np.int32)
        want[q] = v
        mask = np.ones(n_cap, bool)
        mask[q] = False
        want[mask] = old
        return np.array_equal(got, want)

    ok = True
    for i, (n_old, n_ins) in enumerate(
        [(50_000, 40_000), (200_000, 37), (99_999, 5_000), (4_096, 4_096)]
    ):
        ok &= merge_case(n_old, n_ins, seed=100 + i)
    check("merge kernel randomized sweep (fast + wide paths)", ok)

    # 3c. native ragged_all_to_all lowering smoke (1-device mesh degenerate
    # exchange) — so a pod run is not the first time this path compiles
    from rust_msbwt_tpu.ops.merge import kway_merge
    from rust_msbwt_tpu.parallel.sharded_merge import sharded_hm_merge

    groups = [
        np.asarray(
            build_msbwt(*encode_reads(
                [rng.integers(1, 6, 20).astype(np.uint8) for _ in range(10)]
            ), engine="pallas")
        )
        for _ in range(3)
    ]
    # 3 parts on the single real chip: D=1 mesh, all parts packed onto it
    try:
        from rust_msbwt_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
        k = min(len(groups), mesh.devices.size)
        merged = sharded_hm_merge(groups[:k], mesh=mesh, transport="ragged")
        want = kway_merge(groups[:k])
        check("native ragged_all_to_all merge (real-chip mesh)",
              np.array_equal(merged, want))
    except Exception as e:  # lowering failure IS the finding
        print(f"[FAIL] native ragged_all_to_all merge: {type(e).__name__}: {e}",
              flush=True)
        failures += 1

    # 3e. forced-wide (int64 positions) composition on REAL hardware — the
    # >2^31 lowering exercised on-chip at small scale, so the wide path is
    # not pod-day-untested (round-3 verdict item 7): wide sharded build +
    # H-M merge, wide doubling merge, wide sharded-index queries
    try:
        from rust_msbwt_tpu.parallel.doubling_merge import (
            sharded_doubling_merge,
        )
        from rust_msbwt_tpu.parallel.mesh import default_mesh
        from rust_msbwt_tpu.parallel.sharded_build import build_msbwt_sharded
        from rust_msbwt_tpu.parallel.sharded_index import (
            build_sharded_index,
            count_kmers_sharded,
        )

        mesh = default_mesh()
        reads_w, lens_w = encode_reads(
            [rng.integers(1, 6, 25).astype(np.uint8) for _ in range(40)]
        )
        merged_w = build_msbwt_sharded(
            reads_w, lens_w, mesh=mesh, merge="sharded", force_wide=True
        )
        want_w = np.asarray(build_msbwt(reads_w, lens_w, engine="pallas"))
        ok = np.array_equal(merged_w, want_w)
        dbl_w = sharded_doubling_merge(
            [merged_w, want_w], mesh=mesh, force_wide=True
        )
        ok &= np.array_equal(dbl_w, kway_merge([merged_w, want_w]))
        idx_w = build_sharded_index(merged_w, mesh, force_wide=True)
        kq = rng.integers(1, 6, size=(64, 5)).astype(np.uint8)
        got_w = count_kmers_sharded(idx_w, kq)
        ok &= np.array_equal(
            got_w, count_kmers_sharded(build_sharded_index(merged_w, mesh), kq)
        )
        check("forced-wide (int64) build+merge+doubling+query on hw", ok)
    except Exception as e:
        print(f"[FAIL] forced-wide on hw: {type(e).__name__}: {e}", flush=True)
        failures += 1

    # 3d. fused index derivation parity on hardware (non-interpret kernel)
    from rust_msbwt_tpu.ops.bcr import build_msbwt_with_index

    reads_l = [rng.integers(1, 6, rng.integers(8, 40)).astype(np.uint8)
               for _ in range(500)]
    reads2, lens2 = encode_reads(reads_l)
    dec2 = build_msbwt(reads2, lens2, engine="pallas")
    w_idx = build_occ_index(jnp.asarray(dec2))
    w_packed = pack_index(w_idx)
    f_idx, f_packed = build_msbwt_with_index(reads2, lens2, engine="pallas")
    check(
        "fused index derivation == separate derivation (hw kernel)",
        np.array_equal(np.asarray(f_idx.occ), np.asarray(w_idx.occ))
        and np.array_equal(np.asarray(f_packed.table), np.asarray(w_packed.table))
        and np.array_equal(np.asarray(f_idx.bwt), np.asarray(w_idx.bwt)),
    )

    # 4. extend flow parity
    base_l = [rng.integers(1, 6, 30).astype(np.uint8) for _ in range(50)]
    base_r, base_len = encode_reads(base_l)
    base = build_msbwt(base_r, base_len, engine="pallas")
    new_l = [rng.integers(1, 6, 25).astype(np.uint8) for _ in range(20)]
    new_r, new_len = encode_reads(new_l)
    a = build_msbwt(new_r, new_len, base=base, base_string_count=50, engine="xla")
    b = build_msbwt(new_r, new_len, base=base, base_string_count=50,
                    engine="pallas")
    check("extend parity", np.array_equal(a, b))

    # 5a. dynamically-read opt-in knobs (same process)
    from rust_msbwt_tpu.ops.pair_rank import build_pair_index, count_kmers_pair

    pq = rng.integers(0, 6, size=(300, 7)).astype(np.uint8)
    base_counts = count_kmers_pair(build_pair_index(w_idx), pq)
    # non-default arms: the opt-in fast stream and the LEGACY 512-byte
    # rows (60-lane rows are the measured default since round 4)
    for knob, val in (("MSBWT_TPU_PAIR_FAST", "1"),
                      ("MSBWT_TPU_PAIR_ROW60", "0")):
        os.environ[knob] = val
        try:
            got_counts = count_kmers_pair(build_pair_index(w_idx), pq)
            check(f"{knob}={val} pair parity (hw)",
                  np.array_equal(got_counts, base_counts))
        except Exception as e:
            print(f"[FAIL] {knob}={val} pair parity (hw): "
                  f"{type(e).__name__}: {e}", flush=True)
            failures += 1
        finally:
            os.environ.pop(knob, None)

    # 5b. import-time knobs via subprocess children
    for env_kv in (
        {"MSBWT_TPU_BUCKET_GROWTH": "2"},      # legacy growth factor
        {"MSBWT_TPU_TABLE64": "0"},            # legacy 128-lane table rows
        {"MSBWT_TPU_MERGE_CS": "32"},
        {"MSBWT_TPU_MERGE_CS": "64"},   # the pre-round-5 default
        {"MSBWT_TPU_MERGE_CS": "128", "MSBWT_TPU_TABLE64": "0"},
        {"MSBWT_TPU_DMA_DEPTH": "4"},
    ):
        label = ",".join(f"{k.replace('MSBWT_TPU_', '')}={v}"
                         for k, v in env_kv.items())
        try:
            r = subprocess.run(
                [sys.executable, "-m", "benchmarks.validate_tpu", "--knob-child"],
                env={**os.environ, **env_kv}, timeout=1200,
            )
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            # A hung knob child (runtime DMA fault, tunnel stall) must count
            # as that combination failing, not abort the whole validation.
            ok = False
        check(f"knob child [{label}] build+query parity (hw)", ok)

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    if "--knob-child" in sys.argv:
        sys.exit(_knob_child())
    if "--rss" in sys.argv:
        sys.exit(_rss_child(sys.argv[sys.argv.index("--rss") + 1]))
    sys.exit(main())
