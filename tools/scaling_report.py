"""Summarize tools/scaling_runs.sh output → median throughput per config
+ scaling efficiency E = R_32 / (4 · R_8). Prints a markdown table ready
for BENCH/BASELINE.md."""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_results.jsonl"
    rows = [json.loads(l) for l in open(path) if l.strip()]
    by_cores: dict[int, list[dict]] = {}
    for r in rows:
        by_cores.setdefault(r["cores"], []).append(r["result"])
    meds = {}
    print("| cores | runs (wall sec) | median wall | median docs/sec |")
    print("|---|---|---|---|")
    for cores in sorted(by_cores):
        walls = [x["wall_sec"] for x in by_cores[cores]]
        rates = [x["docs_per_sec"] for x in by_cores[cores]]
        meds[cores] = statistics.median(rates)
        print(
            f"| {cores} | {', '.join(f'{w:.1f}' for w in walls)} | "
            f"{statistics.median(walls):.1f} | {meds[cores]:.1f} |"
        )
    if 8 in meds and 32 in meds:
        eff = meds[32] / (4 * meds[8])
        print(f"\nscaling efficiency E = R32/(4*R8) = {eff:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
