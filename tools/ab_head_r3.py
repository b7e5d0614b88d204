"""Powered interleaved A/B: HEAD vs round-3 code (721b7e5) at 100k docs.

Round-4 verdict left one perf `weak`: the judge's small A/B sample leaned
HEAD ~15-30% slower than round-3 code at toy (100k) scale while the
builder's same-session medians leaned HEAD ~10% faster — both samples
tiny against the box's documented 3x bimodal per-run noise
(docs/SCALE.md). This tool settles it with power: >=5 repetitions, the
two code versions INTERLEAVED inside every repetition (so machine-mode
drift hits both equally), fresh tmpfs checkpoints, tmpfs
spark.local.dir, --warmup on every run, per-stage walls from
run_dedupe's summary JSON so any real delta localizes to a stage.

Usage:
    python tools/ab_head_r3.py INPUT OUT.jsonl [reps] [cores] [r3_sha]

Appends one JSON line per run:
    {"code": "head"|"r3", "rep": R, "result": {wall_sec, stages...}}
and prints a median table + per-stage decomposition at the end.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_DIR = "/tmp/ab_r3code"


def ensure_r3(sha: str) -> None:
    if os.path.exists(os.path.join(R3_DIR, "run_dedupe.py")):
        return
    subprocess.run(
        ["git", "worktree", "add", "--detach", R3_DIR, sha],
        cwd=REPO, check=True, capture_output=True,
    )


def one_run(cwd: str, inp: str, cores: int, ckpt: str) -> dict:
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
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
        cwd=cwd, env=env, capture_output=True, text=True, check=True,
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    inp = sys.argv[1]
    out_path = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    r3_sha = sys.argv[5] if len(sys.argv) > 5 else "721b7e5"
    ensure_r3(r3_sha)

    walls: dict[str, list[float]] = {"head": [], "r3": []}
    stage_walls: dict[str, dict[str, list[float]]] = {"head": {}, "r3": {}}
    for rep in range(1, reps + 1):
        # alternate which side goes first each rep so a monotonic
        # machine-mode drift cannot systematically favor one side
        order = [("head", REPO), ("r3", R3_DIR)]
        if rep % 2 == 0:
            order.reverse()
        for code, cwd in order:
            t0 = time.time()
            res = one_run(cwd, inp, cores, f"/dev/shm/ab_ckpt_{code}")
            walls[code].append(res["wall_sec"])
            for st, v in res.get("stages", {}).items():
                if "wall_ms" in v:
                    stage_walls[code].setdefault(st, []).append(
                        v["wall_ms"] / 1000
                    )
            with open(out_path, "a") as f:
                f.write(json.dumps({"code": code, "rep": rep, "result": res}) + "\n")
            print(
                f"rep {rep} {code:4s}: wall {res['wall_sec']}s "
                f"[{time.time()-t0:.0f}s incl warmup]",
                flush=True,
            )
            time.sleep(5)

    summary = {}
    for code in ("head", "r3"):
        summary[code] = {
            "median_wall_sec": round(statistics.median(walls[code]), 2),
            "walls": walls[code],
            "stage_medians": {
                st: round(statistics.median(v), 2)
                for st, v in sorted(stage_walls[code].items())
            },
        }
    ratio = summary["head"]["median_wall_sec"] / summary["r3"]["median_wall_sec"]
    summary["head_over_r3_median_ratio"] = round(ratio, 3)
    print(json.dumps(summary, indent=2))
    with open(out_path, "a") as f:
        f.write(json.dumps({"summary": summary}) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
