"""Scaling-efficiency accounting for the distributed paths.

Wall-clock on the 8-virtual-device CPU mesh is meaningless (one physical
core executes all "devices" serially), so this benchmark reports what CAN
be measured honestly off-pod:

1. **Counted communication volume** per merge round, dense vs ragged
   transport, from the actual converged interleave count matrices — the
   quantity that rides ICI/DCN on a real pod.
2. **Weak-scaling model** for the three production paths, combining the
   counted volumes with the measured single-chip compute rates
   (BASELINE.md) and published v5e link bandwidths. The model is the
   standard roofline composition: eff = T_compute / (T_compute + T_comm).
3. **Mesh-program round counts** (merge refinement rounds to fixpoint),
   measured by running the real sharded programs on the virtual mesh.

Run: JAX_PLATFORMS=cpu python benchmarks/scaling.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# v5e per-chip numbers (public): ICI 1600 Gbps/chip bidir ~ 2e11 B/s usable;
# DCN per host ~ 25 GB/s. Compute rates measured on the real chip (BASELINE).
ICI_BW = 2.0e11
DCN_BW = 2.5e10
BUILD_RATE = 13.3e6       # bases/s/chip, 505M config (round 2 measured)
QUERY_RATE = 1.55e6       # q/s/chip at the 505M index (round 1 measured)


def merge_volumes(parts: list[np.ndarray], d: int):
    """Exact per-device per-round exchanged elements for both transports,
    from the converged interleave (host replication of the H-M fixpoint)."""
    from rust_msbwt_tpu.ops.merge import merge_interleave

    # D-way final assignment (source id per merged position) via iterative
    # pairwise merges of (bwt, src) — cheap host bookkeeping, equivalent to
    # the production path
    bwts = [np.asarray(p, np.uint8) for p in parts]
    tags = [np.full(p.size, j) for j, p in enumerate(parts)]
    while len(bwts) > 1:
        nb, nt = [], []
        for i in range(0, len(bwts) - 1, 2):
            inter = merge_interleave(bwts[i], bwts[i + 1])
            m = np.empty(inter.size, np.uint8)
            t = np.empty(inter.size, np.int64)
            m[inter] = bwts[i]
            m[~inter] = bwts[i + 1]
            t[inter] = tags[i]
            t[~inter] = tags[i + 1]
            nb.append(m)
            nt.append(t)
        if len(bwts) % 2:
            nb.append(bwts[-1])
            nt.append(tags[-1])
        bwts, tags = nb, nt
    merged_src = tags[0]
    n = merged_src.size
    blk = -(-n // d)
    C = np.zeros((d, d), np.int64)  # C[block, source]
    for i in range(d):
        seg = merged_src[i * blk : (i + 1) * blk]
        for j in range(d):
            C[i, j] = np.count_nonzero(seg == j)
    lens = np.array([p.size for p in parts + [np.zeros(0)] * (d - len(parts))])
    # ragged: reconstruct sends each source's own elements once; refine sends
    # each block's elements once (tgt) + once (val)
    ragged_per_dev = int(max(lens.max(), C.sum(axis=1).max())) * 3
    # dense: all_gather of ALL sources to every device + full-length psum
    dense_per_dev = int(lens.sum()) * 1 + int(n) * 2
    return C, ragged_per_dev, dense_per_dev, n


def measured_rounds(parts):
    """Count refinement rounds by running the host fixpoint (equals the
    device while_loop trip count)."""
    from rust_msbwt_tpu.utils.oracle import (
        generate_offset_map,
        pairwise_merge_iter,
    )

    # rounds for the D-way merge ~ max rotation period; measure on the
    # pairwise host oracle over the concatenation halves as a proxy
    b0 = "".join("$ACGNT"[s] for s in np.concatenate(parts[: len(parts) // 2]))
    b1 = "".join("$ACGNT"[s] for s in np.concatenate(parts[len(parts) // 2 :]))
    offsets = generate_offset_map([list(b0), list(b1)])
    total = len(b0) + len(b1)
    inter = np.zeros(total, bool)
    final = np.zeros(total, bool)
    final[: len(b0)] = True
    rounds = 0
    while not np.array_equal(inter, final):
        inter = final
        final = pairwise_merge_iter(inter, list(b0), list(b1), offsets)
        rounds += 1
    return rounds


def doubling_rounds(parts):
    """Host replication of the prefix-doubling fixpoint
    (``parallel.doubling_merge``) — counts its while_loop trips."""
    syms = np.concatenate([np.asarray(p, np.uint8) for p in parts])
    n = syms.size
    src = np.concatenate(
        [np.full(p.size, i) for i, p in enumerate(parts)]
    )
    psi = np.lexsort((syms, src))          # stable (src, sym) sort = LF^-1
    fsym = syms[psi].astype(np.int64)
    pref = np.zeros(7, np.int64)
    np.add.at(pref[1:], fsym, 1)
    pref = np.cumsum(pref)
    rank = pref[fsym]                       # position-style, by first symbol
    S = psi
    rounds = 0
    while True:
        key = rank * (n + 1) + rank[S]
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.empty(n, np.int64)
        starts[0] = 0
        idx = np.arange(1, n)
        starts[1:] = np.where(ks[1:] != ks[:-1], idx, 0)
        new_rank = np.empty(n, np.int64)
        new_rank[order] = np.maximum.accumulate(starts)
        rounds += 1
        if np.array_equal(new_rank, rank):
            return rounds
        rank = new_rank
        S = S[S]


def doubling_volumes(n: int, d: int, rounds: int):
    """Per-device exchanged elements for the distributed doubling merge
    (``parallel.doubling_merge``), from its exchange structure: each round
    = 2 permutation gathers (4 scatters x 2 arrays) + 1 PSRS pass (3 key
    arrays + 2-array rank scatter-back); prep ships psi (2 arrays), the
    final pass adds a perm scatter and 2 output gathers."""
    blk = -(-n // d)
    per_round = (2 * 4 + 5) * blk
    fixed = (2 + 7 + 2 * 4) * blk
    return rounds * per_round + fixed


def main():
    from rust_msbwt_tpu.ops.bcr import build_msbwt, encode_reads

    rng = np.random.default_rng(2024)
    genome = rng.integers(1, 6, 5_000).astype(np.uint8)
    reads_l = []
    for _ in range(400):
        s = rng.integers(0, genome.size - 60)
        reads_l.append(genome[s : s + 60])

    print("== communication volume per merge round (counted, elements) ==")
    print(f"{'D':>3} {'n':>8} {'ragged/dev':>11} {'dense/dev':>10} {'ratio':>6}")
    for d in (2, 4, 8):
        groups = [
            build_msbwt(*encode_reads(reads_l[i::d])) for i in range(d)
        ]
        C, ragged, dense, n = merge_volumes(groups, d)
        print(f"{d:>3} {n:>8} {ragged:>11} {dense:>10} {dense/ragged:>6.1f}")

    groups = [build_msbwt(*encode_reads(reads_l[i::8])) for i in range(8)]
    rounds = measured_rounds(groups)
    n = sum(g.size for g in groups)
    print(f"\nmerge refinement rounds to fixpoint (n={n}): {rounds} "
          f"(bound: max rotation period = 61)")
    dbl_rounds = doubling_rounds(groups)
    print(f"prefix-doubling rounds to fixpoint (same data): {dbl_rounds} "
          f"(bound: ceil(log2 61) + 1 = 7)")
    dbl_vol = doubling_volumes(n, 8, dbl_rounds)
    hm_vol = rounds * merge_volumes(groups, 8)[1]
    print(f"total exchanged elements/device: doubling {dbl_vol} vs "
          f"H-M ragged {hm_vol} — on this low-coverage toy H-M converges "
          f"early ({rounds} << period bound 61) and wins; the crossover is "
          f"~{(13 * dbl_rounds + 17) // 3} H-M rounds. High-coverage real "
          "read sets hit the period bound (duplicate reads share full-"
          "length rotations), where doubling ships "
          f"{101 * 3 / (13 * 8 + 17):.1f}x less and syncs "
          f"{101 * 3 // (8 * 13)}x fewer times at 100 bp.")

    print("\n== weak-scaling efficiency model (v5e pod, per-chip load fixed) ==")
    print("path: counting queries via PARTITIONED indexes (the scaling path:")
    print("counts are additive over read partitions; comm = one [B] psum)")
    B = 1_000_000
    for d in (2, 4, 8, 64):
        t_comp = B / QUERY_RATE
        t_comm = (B * 8 * np.log2(d)) / ICI_BW  # psum butterfly, 8B counts
        eff = t_comp / (t_comp + t_comm)
        print(f"  D={d:>3}: efficiency {eff:.1%}")
    print("path: distributed BUILD (per-shard BCR + ragged D-way merge),")
    print("505M symbols/chip weak scaling:")
    n_per = 505e6
    for d in (2, 4, 8):
        t_comp = n_per / BUILD_RATE
        rounds_est = 101  # max rotation period for 100bp reads
        t_comm = rounds_est * (3 * n_per * 4) / ICI_BW
        dbl_r = int(np.ceil(np.log2(101))) + 1
        t_dbl = (dbl_r * 13 + 17) * n_per * 4 / ICI_BW
        eff = t_comp / (t_comp + t_comm)
        eff_d = t_comp / (t_comp + t_dbl)
        print(f"  D={d:>3}: H-M efficiency {eff:.1%} "
              f"(comm {t_comm:.1f}s), doubling {eff_d:.1%} "
              f"(comm {t_dbl:.1f}s) vs compute {t_comp:.1f}s")
    print("  (dense transport at D=8 would ship "
          f"{(101 * (8 * n_per + 2 * 8 * n_per) * 4) / ICI_BW:.0f}s of traffic "
          "per device — the ragged transport is what makes ≥80% reachable)")
    print("  long reads (1 kb): H-M needs ~1001 rounds, doubling ~12 — "
          f"comm {1001 * 3 * n_per * 4 / ICI_BW:.0f}s vs "
          f"{(12 * 13 + 17) * n_per * 4 / ICI_BW:.0f}s per device")


if __name__ == "__main__":
    sys.exit(main())
