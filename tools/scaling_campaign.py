"""Medians-backed scaling campaign (round-4 judge directive: the 4M
headline rows were single runs on a VM with a documented ±2× noise band —
"both claims cannot hold simultaneously"; settle it with 3-run medians).

Protocol per BENCH/BASELINE.md: identical job + input across a ladder of
parallelism levels, fresh tmpfs checkpoints per run, spark.local.dir on
tmpfs, core counts INTERLEAVED inside each repetition round so slow-mode
drift hits every config equally, per-stage walls recorded from
run_dedupe's summary JSON so non-scaling stages localize.

Usage:
    python tools/scaling_campaign.py INPUT OUT.jsonl [cores,cores,...] [runs]

Defaults: cores 4,8,16,32 runs 3. Appends one JSON line per run:
    {"cores": C, "run": R, "result": {wall_sec, docs_per_sec, stages...}}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(inp: str, cores: int, ckpt: str) -> dict:
    shutil.rmtree(ckpt, ignore_errors=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_LOCAL_DIR="/dev/shm/spark_local",
    )
    out = subprocess.run(
        [
            sys.executable, "run_dedupe.py", "--warmup",
            "--master", f"local[{cores}]",
            "--input", inp, "--ckpt", ckpt,
        ],
        cwd=REPO, env=env, capture_output=True, text=True, check=True,
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    inp = sys.argv[1]
    out_path = sys.argv[2]
    cores_list = [int(c) for c in (sys.argv[3] if len(sys.argv) > 3 else "4,8,16,32").split(",")]
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    ckpt = "/dev/shm/scale_ckpt_run"
    for run in range(1, n_runs + 1):
        for cores in cores_list:
            t0 = time.time()
            res = one_run(inp, cores, ckpt)
            with open(out_path, "a") as f:
                f.write(json.dumps({"cores": cores, "run": run, "result": res}) + "\n")
            print(
                f"run {run} cores {cores}: wall {res['wall_sec']}s "
                f"({res['docs_per_sec']} docs/s) [{time.time()-t0:.0f}s incl warmup]",
                flush=True,
            )
            time.sleep(10)  # let the kernel settle page cache between runs
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
