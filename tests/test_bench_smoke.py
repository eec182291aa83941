"""bench.py delivery contract: ONE parseable JSON line on stdout.

Round 3's bench measured everything (twice) and then crashed at the emit
step (``NameError`` at what was bench.py:431) — nothing had ever executed
``main()`` through ``emit()``. This smoke runs the REAL bench end-to-end in
``--tiny`` mode on CPU so the delivery path is exercised on every commit.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_tiny_emits_one_json_line():
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "MSBWT_BENCH_NO_PREFLIGHT": "1"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--tiny"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line:\n{r.stdout}"
    rec = json.loads(lines[0])
    for field in ("metric", "value", "unit", "vs_baseline"):
        assert field in rec, field
    assert rec["value"] > 0
    assert rec["unit"] == "queries/s"
    assert rec["extra"]["toy_query_qps"] == rec["value"]  # tiny == toy path


def test_bench_large_subprocess_plumbing():
    """The 505M leg runs in a fresh subprocess (jaxlib-0.9 segfault guard);
    this exercises the LARGE_RESULT marker round-trip with a stubbed
    run_large so the parent parsing path is covered on CPU."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "MSBWT_BENCH_NO_PREFLIGHT": "1",
           "MSBWT_BENCH_FAKE_LARGE": "1"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--tiny"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line:\n{r.stdout}"
    rec = json.loads(lines[0])
    assert rec["extra"]["ecoli_505M"].get("fake") is True
    assert rec["value"] == 12345  # headline took the (stub) 505M number


def test_bench_no_retry_on_deterministic_errors():
    """A NameError-class bug must fail fast, not burn a second full
    hardware pass (round 3 re-ran ~8 min of TPU work into the same crash)."""
    src = open(os.path.join(REPO, "bench.py")).read()
    head = src.split("def main", 1)[0]
    assert "\nimport os\n" in head  # the round-3 crash: os used, never imported
    assert "except (NameError, AttributeError, ImportError" in src
