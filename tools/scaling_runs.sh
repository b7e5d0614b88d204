#!/bin/bash
# Scaling-evidence protocol (BENCH/BASELINE.md): identical job + input at
# two parallelism levels (local[8] vs local[32] on a 32-core host), fresh
# checkpoints per run, shuffle partitions ∝ cores, spark.local.dir +
# checkpoints on tmpfs (a single shared virtual disk does not scale with
# thread count; tmpfs isolates engine scaling from sandbox disk), configs
# alternated so machine drift hits both equally, 3 runs each, median.
set -u
INPUT=${INPUT:-/tmp/spark_graft_bench/pages_1000000}
OUT=${1:-/tmp/scaling_results.jsonl}
mkdir -p /dev/shm/spark_local
: > "$OUT"
for run in 1 2 3; do
  for cores in 8 32; do
    ckpt=/dev/shm/scale_ckpt_run
    rm -rf "$ckpt"
    line=$(SPARK_GRAFT_CPUS=$cores SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark_local \
      python run_dedupe.py --warmup --master "local[$cores]" --input "$INPUT" --ckpt "$ckpt" 2>/dev/null | tail -1)
    echo "{\"cores\": $cores, \"run\": $run, \"result\": $line}" >> "$OUT"
    rm -rf "$ckpt"
    sleep 10
  done
done
