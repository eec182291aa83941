"""The chr21-shaped flow as ONE command across REAL processes
(benchmarks/rehearsal.py): 2 jax.distributed procs -> per-device builds ->
wide doubling merge -> sharded export -> reload -> global-mesh queries vs
oracle, with machine-readable pass/fail + per-phase timings."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rehearsal_two_procs():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "rehearsal.py"),
         "--procs", "2", "--reads", "80"],
        capture_output=True, text=True, timeout=840, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["ok"] is True
    assert rec["procs"] == 2 and rec["devices"] == 4
    assert rec["wide"] is True
    for phase in ("build_s", "merge_s", "export_s", "reload_s", "query_s"):
        assert phase in rec["phases"]
