#!/bin/bash
# Hardware A/B session for the round-3 opt-in perf levers. Run when the
# axon tunnel is healthy; results land in /tmp/probe_logs/. Ordered so a
# mid-session tunnel drop loses the least (cheap decisions first, the
# potentially-runtime-faulting i16 probe LAST). Each step runs under
# `timeout` so a hang cannot wedge the session.
set -u
cd /root/repo
LOGS=/tmp/probe_logs
mkdir -p "$LOGS"
export PYTHONUNBUFFERED=1

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
#    every number after it
step health 600 python - <<'EOF'
import time, numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices())
from rust_msbwt_tpu.utils.profiling import session_health
print(session_health())
EOF

# 1. pair-stream rewrite verification at 505M (round-3 late rewrite:
#    expected ~7.5s -> ~1s)
step pairfast 1800 python benchmarks/probes/probe_pairfast.py

# 2. merge chunk-size sweep at the 505M build config (biggest potential
#    build win if per-chunk overhead dominates at scale)
step merge_cs 7200 python benchmarks/probes/probe_merge_cs.py 5000000 100 64 128 256

# 2b. DMA pipeline depth at the 505M config (if the ~4us/chunk at scale
#     is window-read latency, 4 outstanding DMAs should shrink it)
step dma4 2400 env MSBWT_TPU_DMA_DEPTH=4 python benchmarks/probes/probe_merge_cs.py 5000000 100 64

# 3. bucket growth factor A/B at 1M reads
step growth 1800 python benchmarks/probes/probe_growth.py 1000000 2,1.3

# 4. compact 240B pair rows at 505M
step row60 1800 python benchmarks/probes/probe_row60.py

# 5. composed best-of + raw gather rates + deep caches
step final 3600 python benchmarks/probes/probe_final.py

# 6. 64-lane fused table rows: steady build A/B in subprocesses (the
#    plane layout freezes at import)
step table64_off 2400 python benchmarks/probes/probe_merge_cs.py 1000000 100 64
step table64_on 2400 env MSBWT_TPU_TABLE64=1 python benchmarks/probes/probe_merge_cs.py 1000000 100 64

# 7. LAST: primitives that can hard-fault the TPU runtime, then their
#    build-scale A/Bs (vs the table64_off baseline arm above)
step ins8 900 python benchmarks/probes/probe_ins8.py
step ins8_build 2400 env MSBWT_TPU_INS8=1 python benchmarks/probes/probe_merge_cs.py 1000000 100 64
step i16 1200 python benchmarks/probes/probe_i16.py

echo "=== all done; logs in $LOGS ==="
