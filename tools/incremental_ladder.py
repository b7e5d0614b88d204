"""Incremental text-index throughput ladder (round-4 verdict item #6):
fold a crawl batch into a committed 1M-doc index at two parallelism
levels (the sandbox's honest stand-in for N vs 4N executors — see
docs/SCALE.md) and across a ladder of batch sizes at fixed cores, so
the two headline properties of plans/incremental.py get numbers:

  1. scaling efficiency E(N->4N) of ``incremental_update`` itself
     (not just the batch pipeline), and
  2. batch-proportionality: wall vs batch size with the index size
     HELD at 1M docs.

Every update MUTATES the index (bucket/signature appends + cluster map
rewrites), so each measured run gets a fresh copy of the committed
base index (cp on tmpfs, outside the timed section). Core counts are
interleaved inside each repetition round, same anti-drift protocol as
tools/scaling_campaign.py. Each update runs in its own subprocess via
tools/incremental_bench.py so the JVM is sized to the run's core
count.

Usage:
  python tools/incremental_ladder.py OUT.jsonl \
      [--index-docs 1000000] [--cores 2,8] [--reps 3] \
      [--batches 25000,50000,100000] [--work /dev/shm/incr_ladder]

Appends one JSON line per measured update; prints a final summary
line with medians, E(N->4N), and the batch-proportionality row.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args: list[str], env: dict | None = None) -> dict:
    out = subprocess.run(
        [sys.executable] + args, cwd=REPO, text=True,
        capture_output=True, check=True,
        env=dict(os.environ, **(env or {})),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--index-docs", type=int, default=1_000_000)
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batches", default="25000,50000,100000")
    ap.add_argument("--work", default="/dev/shm/incr_ladder")
    a = ap.parse_args()
    cores_list = [int(c) for c in a.cores.split(",")]
    batch_sizes = [int(b) for b in a.batches.split(",")]
    ladder_batch = max(batch_sizes)

    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    work = a.work
    os.makedirs(work, exist_ok=True)
    base_input = f"{work}/index_input"
    base_ckpt = f"{work}/index_base"

    def emit(rec: dict) -> None:
        rec["ts"] = round(time.time(), 1)
        with open(a.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    # ---- one-time setup: 1M input -> committed pipeline ckpt -> buckets
    if not os.path.exists(f"{base_input}/_SUCCESS"):
        emit({"phase": "gen-index-input", **sh(
            ["tools/incremental_bench.py", "gen-batch",
             str(a.index_docs), "0", base_input])})
    if not os.path.exists(f"{base_ckpt}/canonical/_SUCCESS"):
        t0 = time.time()
        subprocess.run(
            [sys.executable, "run_dedupe.py", "--warmup",
             "--master", "local[32]", "--input", base_input,
             "--ckpt", base_ckpt],
            cwd=REPO, check=True, capture_output=True, text=True,
            env=dict(os.environ, SPARK_GRAFT_CPUS="32",
                     SPARK_GRAFT_LOCAL_DIR="/dev/shm/spark_local"),
        )
        emit({"phase": "build-index", "wall_sec": round(time.time() - t0, 1)})
    emit({"phase": "init-buckets", **sh(
        ["tools/incremental_bench.py", "init", base_ckpt, "32", "24g"])})

    # ---- batch inputs: "the next docs" after the index
    batch_paths: dict[int, str] = {}
    for n in batch_sizes:
        p = f"{work}/batch_{n}"
        if not os.path.exists(f"{p}/_SUCCESS"):
            emit({"phase": "gen-batch", **sh(
                ["tools/incremental_bench.py", "gen-batch",
                 str(n), str(a.index_docs), p])})
        batch_paths[n] = p

    def timed_update(cores: int, batch_docs: int, tag: str) -> dict:
        ckpt = f"{work}/run_ckpt"
        shutil.rmtree(ckpt, ignore_errors=True)
        # fresh index copy OUTSIDE the timed section (updates mutate it)
        shutil.copytree(base_ckpt, ckpt)
        rep = sh(
            ["tools/incremental_bench.py", "update", ckpt,
             batch_paths[batch_docs], f"b_{tag}", str(cores),
             "24g" if cores >= 8 else "12g"])
        shutil.rmtree(ckpt, ignore_errors=True)
        rec = {"phase": "update", "tag": tag, "cores": cores,
               "batch_docs": batch_docs,
               "docs_per_sec": round(batch_docs / rep["wall_sec"], 1),
               **{k: rep[k] for k in (
                   "wall_sec", "s1_sec", "pairs_sec", "cc_sec",
                   "resolve_sec", "commit_sec", "edges",
                   "touched_clusters", "new_docs") if k in rep}}
        emit(rec)
        return rec

    # ---- ladder: cores interleaved inside every repetition round
    walls: dict[int, list[float]] = {c: [] for c in cores_list}
    for rep in range(1, a.reps + 1):
        order = cores_list if rep % 2 else list(reversed(cores_list))
        for cores in order:
            r = timed_update(cores, ladder_batch, f"lad_r{rep}_c{cores}")
            walls[cores].append(r["wall_sec"])

    # ---- batch proportionality at the top ladder core count
    prop_cores = max(cores_list)
    prop: dict[int, float] = {}
    for n in batch_sizes:
        if n == ladder_batch:
            prop[n] = statistics.median(walls[prop_cores])
            continue
        r = timed_update(prop_cores, n, f"prop_{n}_c{prop_cores}")
        prop[n] = r["wall_sec"]

    med = {c: statistics.median(w) for c, w in walls.items()}
    lo, hi = min(cores_list), max(cores_list)
    eff = med[lo] / (med[hi] * (hi / lo)) if len(cores_list) > 1 else None
    summary = {
        "phase": "summary", "index_docs": a.index_docs,
        "ladder_batch_docs": ladder_batch,
        "wall_medians_by_cores": med,
        "walls_by_cores": walls,
        "scaling_efficiency": round(eff, 3) if eff else None,
        "efficiency_pair": [lo, hi],
        "batch_proportionality_walls": prop,
    }
    emit(summary)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
