"""Variance-immune radix-2 A/B on its target domain (long reads).

Round-3 history: radix-2 BCR (two read columns per merge pass) is a
measured LOSS on short reads (505M as 5M x 100bp: 41.4 -> 113.9 s) because
its [N]-sized per-pair corrections dwarf the capacity-proportional merge
saving at N=5M. On LONG reads (N small, L large) the sign should flip —
but a first A/B drowned in the platform's ~2x session variance.

This probe implements the round-4 decision protocol (VERDICT item 6):

* config 500k x 1000bp (500M symbols, N/L inverted vs the flagship),
* both arms warmed (compile excluded), then ROUND-INTERLEAVED A/B — the
  radix knob is read per call (ops.bcr.build_radix), so arms alternate
  inside one process and slow session drift cancels in the per-round
  ratio; order flips each round (AB, BA, AB, ...) to cancel linear drift
  within a round,
* median-of-9 per-round ratios (a deadline guard keeps >=5 rounds on a
  slow session), session health recorded before and after,
* verdict line: RADIX2_VERDICT win|loss|inconclusive ratio=<median>
  (win requires median >= 1.15x AND every-round agreement on direction).

Usage: python benchmarks/probes/probe_radix2.py [n_reads] [read_len] [rounds]
"""

import os
import sys
import time

import numpy as np

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
READ_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 9
DEADLINE_S = float(os.environ.get("MSBWT_PROBE_DEADLINE_S", "3000"))

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from rust_msbwt_tpu.ops.bcr import build_msbwt  # noqa: E402
from rust_msbwt_tpu.utils.profiling import session_health  # noqa: E402


def sync(x):
    return int(np.asarray(x.ravel()[:1])[0])


def run(radix: int) -> float:
    os.environ["MSBWT_TPU_RADIX"] = str(radix)
    t0 = time.perf_counter()
    sync(build_msbwt(reads, lengths, device_out=True))
    return time.perf_counter() - t0


print(f"radix-2 interleaved A/B: {N_READS} x {READ_LEN}bp "
      f"({N_READS * (READ_LEN + 1) / 1e6:.0f}M symbols), {ROUNDS} rounds",
      flush=True)
print(f"health(before): {session_health()}", flush=True)

rng = np.random.default_rng(0x10A6)
genome = rng.integers(1, 6, size=4_600_000).astype(np.uint8)
starts = rng.integers(0, genome.size - READ_LEN, N_READS)
reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
lengths = np.full(N_READS, READ_LEN, np.int32)

t_start = time.perf_counter()
print(f"  warm radix=1 (compile): {run(1):.1f}s", flush=True)
print(f"  warm radix=2 (compile): {run(2):.1f}s", flush=True)

ratios = []
for r in range(ROUNDS):
    if time.perf_counter() - t_start > DEADLINE_S and len(ratios) >= 5:
        print(f"  deadline hit after {len(ratios)} rounds", flush=True)
        break
    if r % 2 == 0:
        t1, t2 = run(1), run(2)
    else:
        t2, t1 = run(2), run(1)
    ratios.append(t1 / t2)  # >1 means radix-2 faster
    print(f"  round {r}: radix1={t1:.1f}s radix2={t2:.1f}s "
          f"ratio={t1 / t2:.3f}", flush=True)

ratios.sort()
med = ratios[len(ratios) // 2]
agree_win = all(x > 1.0 for x in ratios)
agree_loss = all(x < 1.0 for x in ratios)
if med >= 1.15 and agree_win:
    verdict = "win"
elif med < 1.15 and (agree_loss or med < 1.0):
    verdict = "loss"
else:
    verdict = "inconclusive"
print(f"health(after): {session_health()}", flush=True)
print(f"RESULT radix2_ratio median={med:.3f}s", flush=True)  # summarizer key
print(f"RADIX2_VERDICT {verdict} ratio={med:.3f} rounds={len(ratios)} "
      f"all={[round(x, 3) for x in ratios]}", flush=True)
