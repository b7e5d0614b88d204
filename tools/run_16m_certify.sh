#!/bin/bash
# Round-5 16M certification runbook (judge directive #3: candidates
# phase <250s zero-scratch on round-5 HEAD, plan assertion holding).
# Replicates the round-4 16M protocol: regen input from seed, one full
# cold run (disk ckpt, 34g heap), then the zero-scratch kernel
# decomposition against the committed S1.
set -euo pipefail
cd /root/repo
INP=/tmp/spark_graft_bench/pages_16000000
CKPT=/tmp/spark_graft_ckpt16

echo "=== gen 16M ==="
python tools/pairs_profile.py gen 16000000 "$INP" | tee /tmp/p16_gen.json

echo "=== full cold run (disk ckpt) ==="
python tools/pairs_profile.py full "$INP" "$CKPT" - 32 34g | tee /tmp/p16_full.json

echo "=== kernels (zero-scratch) against committed S1 ==="
python tools/pairs_profile.py kernels "$CKPT" 32 34g | tee /tmp/p16_kernels.json

echo "=== done ==="
