"""Variance-immune interleaved A/B for import-frozen build levers.

Sequential sweeps (one subprocess per arm, arms minutes apart) cannot
decide close calls on this platform: the 505M build shows ~2x in-session
drift, so an arm's median is dominated by WHEN it ran. This driver
interleaves arms in ROUNDS — every round launches one fresh subprocess
per arm back-to-back (env knobs are frozen at ops.pallas_merge import, so
each arm needs its own process; the persistent jax compile cache makes
every round warm after the first) — and decides on the MEDIAN OF
PER-ROUND RATIOS vs the baseline arm, where slow drift cancels.

Each child does one warm build (program-load warm-up — the diagnosed
round-3 variance source) then REPS measured builds and reports the MIN
(noise is additive: contention and drift only ever slow a rep down).

Usage:
  python benchmarks/probes/interleaved_ab.py '<arms_json>' [n_reads] \
      [read_len] [rounds]
  arms_json: {"label": {"ENV": "VAL", ...}, ...} — first key = baseline.
Example:
  python benchmarks/probes/interleaved_ab.py \
      '{"cs64": {}, "cs256": {"MSBWT_TPU_MERGE_CS": "256"}}' 5000000 100 5
"""

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
REPS = 3


def _child() -> int:
    sys.stdout.reconfigure(line_buffering=True)
    n_reads, read_len = int(sys.argv[1]), int(sys.argv[2])
    import numpy as np

    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_ab")
    from rust_msbwt_tpu.ops.bcr import build_msbwt

    rng = np.random.default_rng(0x505)
    genome = rng.integers(1, 6, size=4_600_000).astype(np.uint8)
    starts = rng.integers(0, genome.size - read_len, n_reads)
    reads = genome[starts[:, None] + np.arange(read_len)[None, :]]
    lengths = np.full(n_reads, read_len, np.int32)

    def sync(x):
        return int(np.asarray(x.ravel()[:1])[0])

    t0 = time.perf_counter()
    sync(build_msbwt(reads, lengths, device_out=True))
    warm = time.perf_counter() - t0  # compile (first round) + program load
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(build_msbwt(reads, lengths, device_out=True))
        times.append(time.perf_counter() - t0)
    print(f"AB_CHILD warm={warm:.2f} min={min(times):.3f} "
          f"all={[round(t, 2) for t in times]}", flush=True)
    return 0


def main() -> int:
    arms: dict[str, dict] = json.loads(sys.argv[1])
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    read_len = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    labels = list(arms)
    base = labels[0]
    results: dict[str, list[float]] = {lb: [] for lb in labels}

    for r in range(rounds):
        order = labels if r % 2 == 0 else labels[::-1]  # cancel linear drift
        for lb in order:
            env = {**os.environ, **arms[lb], "_MSBWT_AB_CHILD": "1"}
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 str(n_reads), str(read_len)],
                env=env, capture_output=True, text=True, timeout=3600,
                cwd=REPO,
            )
            line = next((ln for ln in p.stdout.splitlines()
                         if ln.startswith("AB_CHILD")), None)
            if p.returncode != 0 or line is None:
                print(f"round {r} arm {lb}: CHILD FAILED rc={p.returncode}\n"
                      f"{p.stderr[-1500:]}", flush=True)
                results[lb].append(float("nan"))
                continue
            tmin = float(line.split("min=")[1].split()[0])
            results[lb].append(tmin)
            print(f"round {r} arm {lb}: {line.split(' ', 1)[1]} "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)

    print("\n=== interleaved A/B summary ===", flush=True)
    for lb in labels:
        ok = [t for t in results[lb] if t == t]
        if not ok:
            print(f"{lb}: all rounds failed", flush=True)
            continue
        med = sorted(ok)[len(ok) // 2]
        print(f"RESULT {lb} median={med:.3f}s all={[round(t, 2) for t in ok]}",
              flush=True)
    base_ts = results[base]
    for lb in labels[1:]:
        ratios = [b / t for b, t in zip(base_ts, results[lb])
                  if b == b and t == t]
        if not ratios:
            continue
        ratios.sort()
        med = ratios[len(ratios) // 2]
        agree = all(x > 1 for x in ratios) or all(x < 1 for x in ratios)
        print(f"AB_VERDICT {lb}_vs_{base} speedup={med:.3f} "
              f"agree={agree} all={[round(x, 3) for x in ratios]}", flush=True)
    return 0


if __name__ == "__main__":
    if os.environ.get("_MSBWT_AB_CHILD") == "1":
        sys.exit(_child())
    sys.exit(main())
