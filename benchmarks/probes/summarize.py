"""Summarize a hardware A/B session's probe logs into a decision table.

Reads ``/tmp/probe_logs/*.log`` (or a directory given as argv[1]) —
tolerant of missing/partial logs from a mid-session tunnel drop — and
prints the lines the README decision table keys on, plus a verdict
column where a baseline arm exists in the same session.

Usage: python -m benchmarks.probes.summarize [logdir]
"""
from __future__ import annotations

import os
import re
import sys


def _read(logs: str, name: str) -> str:
    try:
        with open(os.path.join(logs, name + ".log")) as fh:
            return fh.read()
    except OSError:
        return ""


def _results(text: str) -> dict[str, float]:
    """RESULT cs=64 median=12.34 ... -> {'cs=64': 12.34}"""
    out = {}
    for m in re.finditer(r"RESULT (\S+) median=([0-9.]+)", text):
        out[m.group(1)] = float(m.group(2))
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    logs = argv[0] if argv else "/tmp/probe_logs"
    if not os.path.isdir(logs):
        print(f"no probe logs at {logs}")
        return 1

    print(f"=== probe session summary ({logs}) ===")
    health = _read(logs, "health")
    m = re.search(r"\{.*dispatch_roundtrip_ms.*\}", health)
    print(f"health: {m.group(0) if m else 'MISSING (session aborted?)'}")

    base = _results(_read(logs, "merge_cs"))
    if base:
        ref = base.get("cs=64")
        for k, v in sorted(base.items()):
            rel = f"  ({ref / v:.2f}x vs cs=64)" if ref and v else ""
            print(f"merge_cs {k}: {v:.2f}s{rel}")
    else:
        print("merge_cs: no RESULT lines")

    for name, baseline_name in (
        ("dma4", "merge_cs"),        # vs same-scale cs=64 arm
        ("table64_on", "table64_off"),
    ):
        res = _results(_read(logs, name))
        ref = _results(_read(logs, baseline_name)).get("cs=64")
        for k, v in sorted(res.items()):
            rel = f"  ({ref / v:.2f}x vs baseline)" if ref and v else ""
            print(f"{name} {k}: {v:.2f}s{rel}")
        if not res:
            print(f"{name}: no RESULT lines")

    for name, patterns in (
        ("pairfast", [r"(legacy.*|rowgather.*|.*steady [0-9.]+s.*)"]),
        ("growth", [r"growth=[0-9.]+: steady [0-9.]+s.*"]),
        ("row60", [r".*M q/s device.*"]),
        ("final", [r".*GB/s", r"pair cache_k=\d+: .*", r"cache 6\^10 .*"]),
    ):
        text = _read(logs, name)
        if not text:
            print(f"{name}: log missing")
            continue
        hits = []
        for pat in patterns:
            hits += re.findall(pat, text)
        for h in hits[:8]:
            print(f"{name}: {h.strip()}")
        if not hits:
            print(f"{name}: ran, no recognized lines (see {name}.log)")
    print("=== apply per benchmarks/probes/README.md decision table ===")
    return 0


if __name__ == "__main__":
    sys.exit(main())
