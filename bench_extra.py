#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1).

NOT the driver contract — ``bench.py`` stays frozen. This file exists so
per-query isolation, repeats and plan capture can run without touching
the measured artifact:

  python bench_extra.py --sf-dir /root/testdata/sf1.0 --reps 3 \
      substring_extent_pairs containment_dedup

- times each named query with the SAME methodology as bench.py
  (build + .count()), labelled via setJobDescription;
- ``--noop`` switches the sink to ``format("noop")`` (guide §1.4) so
  every column is computed (count() can prune);
- ``--explain plans/r06`` writes ``<query>_<tag>.txt`` with
  ``explain("formatted")`` for each query;
- prints one JSON line per rep and a final summary with per-query
  min/median.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: bench.py list)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of count()")
    ap.add_argument("--explain", default=None, metavar="DIR", help="write explain('formatted') per query")
    ap.add_argument("--tag", default="before", help="suffix for explain files")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    if "SPARK_GRAFT_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark_local", exist_ok=True)
        os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/spark_local"

    from dedupe_trees_spark.session import get_spark
    import dedupe_trees_spark.queries as Q

    spark = get_spark("bench_extra")
    names = args.queries or list(Q.QUERIES)
    sf_dir = args.sf_dir

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = Q.QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(txt)

    # one tiny warmup evaluation so rep 1 doesn't time JVM/worker spin-up
    Q.QUERIES[names[0]](spark, sf_dir).limit(1).count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        timings = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"r06 bench_extra: {name}")
            t0 = time.time()
            df = Q.QUERIES[name](spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = round(time.time() - t0, 3)
            timings[name] = dt
            samples[name].append(dt)
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"rep": rep, "sf_dir": sf_dir, "queries": timings}), flush=True)

    summary = {
        n: {
            "min": min(v),
            "median": round(statistics.median(v), 3),
            "samples": v,
        }
        for n, v in samples.items()
    }
    out = {"sf_dir": sf_dir, "noop": args.noop, "summary": summary}
    print(json.dumps(out), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
