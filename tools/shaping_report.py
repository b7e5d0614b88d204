"""Summarize shaping/subdoc ladder JSONs (tools/shaping_scale.py or
tools/subdoc_scale.py outputs) → per-phase per-core-count medians and
every N→4N pairwise efficiency E = (wall_N/wall_4N)/4. Prints markdown
ready for BENCH/BASELINE.md.

Usage: python tools/shaping_report.py /tmp/shaping_1m_c*_r*.json
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if not runs:
        print("usage: shaping_report.py FILE.json [FILE.json ...]")
        return 1
    skip = {"input", "cores", "n_docs", "n_eval"}
    phases = [k for k in runs[0] if k not in skip and isinstance(runs[0][k], dict)]
    by = {}  # (phase, cores) -> [wall]
    for r in runs:
        for ph in phases:
            if ph in r:
                by.setdefault((ph, r["cores"]), []).append(r[ph]["wall_sec"])
    cores = sorted({c for (_, c) in by})
    n_docs = runs[0].get("n_docs")
    print(f"<!-- {len(runs)} runs, n_docs={n_docs}, cores={cores} -->")
    hdr = "| phase | " + " | ".join(
        f"{c}-core median (runs)" for c in cores
    )
    pairs = [(a, b) for a in cores for b in cores if b == 4 * a]
    hdr += "".join(f" | E({a}→{b})" for a, b in pairs) + " |"
    print(hdr)
    print("|" + "---|" * (1 + len(cores) + len(pairs)))
    for ph in phases:
        cells = []
        med = {}
        for c in cores:
            walls = by.get((ph, c), [])
            med[c] = statistics.median(walls) if walls else None
            runs_s = "/".join(f"{w:g}" for w in sorted(walls))
            cells.append(f"{med[c]:.1f} s ({runs_s})" if walls else "—")
        evals = []
        for a, b in pairs:
            if med.get(a) and med.get(b):
                evals.append(f"**{(med[a] / med[b]) / (b / a):.2f}**")
            else:
                evals.append("—")
        print(f"| {ph} | " + " | ".join(cells + evals) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
