"""Scale + scaling-efficiency evidence for the corpus-shaping operators.

Runs the r4 training-set shaping paths over a large pages input at a
given core count, timing each phase separately:

1. contamination_report — full n=13 report of the corpus against a
   deterministic ~1%-of-corpus eval split (broadcast probe; the corpus
   never shuffles). The heavy phase: per-doc gram build at corpus scale.
2. decontaminate — the anti-join filter (shares the gram build cost).
3. domain_cap — window-free per-domain top-cap over the extracted
   hosts (salted two-phase threshold).
4. stratified/deterministic sample — pure md5-threshold filter;
   effectively free, timed to prove it.

Run at two core counts (e.g. 2 and 8) for the N→4N efficiency pair.

Usage: python tools/shaping_scale.py [pages_parquet] [cores] [OUT.json] [gram|hash]
Prints one JSON document (and writes OUT.json if given). The 4th arg
selects the decontamination join key (default gram; hash = the
documented scale path, xxhash64 over the token-array slice).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pages_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_bench/pages_16m"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    join_on = sys.argv[4] if len(sys.argv) > 4 else "gram"

    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
    )
    from dedupe_trees_spark.operators.domains import (
        deterministic_sample,
        domain_cap,
        extract_domain,
    )
    from dedupe_trees_spark.session import get_spark

    spark = get_spark(
        app_name="shaping_scale",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/shaping_tmp",
        },
    )
    pages = spark.read.parquet(pages_path).select("url", "text")
    ev = pages.filter(F.xxhash64("url") % 100 == 0)
    corpus = pages.filter(F.xxhash64("url") % 100 != 0)
    res: dict = {"input": pages_path, "cores": cores, "join_on": join_on}
    n_docs = corpus.count()
    res["n_docs"] = n_docs
    res["n_eval"] = ev.count()

    t0 = time.time()
    rep = contamination_report(corpus, ev, n=13, text_col="text", id_col="url", join_on=join_on)
    n_contam = rep.filter("contaminated").count()
    wall = time.time() - t0
    res["report"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "contaminated_docs": n_contam,
    }
    print(json.dumps({"phase": "report", **res["report"]}), flush=True)

    t0 = time.time()
    n_kept = decontaminate(corpus, ev, n=13, text_col="text", id_col="url", join_on=join_on).count()
    wall = time.time() - t0
    res["decontaminate"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "kept_docs": n_kept,
    }
    print(json.dumps({"phase": "decontaminate", **res["decontaminate"]}), flush=True)

    t0 = time.time()
    d = corpus.withColumn("domain", extract_domain("url"))
    capped = domain_cap(d, 1000, order_col="url", id_col="url", salts=64)
    n_capped = capped.count()
    wall = time.time() - t0
    res["domain_cap"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "kept_docs": n_capped,
    }
    print(json.dumps({"phase": "domain_cap", **res["domain_cap"]}), flush=True)

    t0 = time.time()
    n_sample = deterministic_sample(corpus, 0.3, key_col="url").count()
    wall = time.time() - t0
    res["sample"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "kept_docs": n_sample,
    }
    print(json.dumps({"phase": "sample", **res["sample"]}), flush=True)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
