#!/bin/bash
# Hardware A/B session for the opt-in perf levers. Run when the axon
# tunnel is healthy; results land in /tmp/probe_logs/. Ordered so a
# mid-session tunnel drop loses the least (cheap decisions first). Each
# step runs under `timeout` so a hang cannot wedge the session.
#
# Round-4 note: sequential arms could not decide close calls under the
# platform's ~2x session drift — prefer benchmarks/probes/interleaved_ab.py
# for any build-lever decision; this script remains the broad survey.
# The INS8 / int16-phys levers were decided (loss / structurally refuted)
# and deleted; their steps are gone.
#
# QUICK=1 runs a ~30-minute variant: every build A/B at the 1M-read
# config instead of 5M, and the 505M-only probes skipped — for a short
# or flaky hardware window. Full-scale numbers (the ones BASELINE.md
# cites) need the default mode.
set -u
cd /root/repo
LOGS=/tmp/probe_logs
mkdir -p "$LOGS"
export PYTHONUNBUFFERED=1
QUICK=${QUICK:-0}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$LOGS/$name.log" 2>&1
  local rc=$?
  tail -n 6 "$LOGS/$name.log"
  [ $rc -ne 0 ] && echo "!!! $name exited rc=$rc"
  return 0
}

# 0. session health (dispatch RT / MXU / HBM rates): cheap, contextualizes
#    every number after it — and aborts the session if the tunnel is dead,
#    so a downed tunnel costs 10 minutes, not the sum of every step budget
step health 600 python - <<'EOF'
import time, numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices())
from rust_msbwt_tpu.utils.profiling import session_health
print(session_health())
print("HEALTH_OK")
EOF
if ! grep -q HEALTH_OK "$LOGS/health.log"; then
  echo "!!! tunnel unhealthy (no HEALTH_OK) — aborting the A/B session"
  exit 1
fi

if [ "$QUICK" = "1" ]; then
  BUILD_N=1000000; CS_TMO=2400; AB_TMO=1200
else
  BUILD_N=5000000; CS_TMO=7200; AB_TMO=2400
fi

# 1. pair-stream rewrite verification at 505M (round-3 late rewrite:
#    expected ~7.5s -> ~1s). 505M-scale only — skipped in QUICK mode.
[ "$QUICK" = "1" ] || step pairfast 1800 python benchmarks/probes/probe_pairfast.py

# 2. merge chunk-size sweep at the build config (biggest potential
#    build win if per-chunk overhead dominates at scale)
step merge_cs "$CS_TMO" python benchmarks/probes/probe_merge_cs.py "$BUILD_N" 100 64 128 256

# 2b. DMA pipeline depth (if the ~4us/chunk at scale is window-read
#     latency, 4 outstanding DMAs should shrink it)
step dma4 "$AB_TMO" env MSBWT_TPU_DMA_DEPTH=4 python benchmarks/probes/probe_merge_cs.py "$BUILD_N" 100 64

# 3. bucket growth factor A/B at 1M reads
step growth 1800 python benchmarks/probes/probe_growth.py 1000000 2,1.3

# 4. compact 240B pair rows at 505M — skipped in QUICK mode
[ "$QUICK" = "1" ] || step row60 1800 python benchmarks/probes/probe_row60.py

# 5. composed best-of + raw gather rates + deep caches (505M) — skipped
#    in QUICK mode
[ "$QUICK" = "1" ] || step final 3600 python benchmarks/probes/probe_final.py

# 6. 64-lane fused table rows: steady build A/B in subprocesses (the
#    plane layout freezes at import)
step table64_off "$AB_TMO" python benchmarks/probes/probe_merge_cs.py 1000000 100 64
step table64_on "$AB_TMO" env MSBWT_TPU_TABLE64=1 python benchmarks/probes/probe_merge_cs.py 1000000 100 64

echo "=== all done; logs in $LOGS ==="
python -m benchmarks.probes.summarize "$LOGS" || true
