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

5. gopher_rules — the quality flag battery (zero-exchange map).
6. block_urls — broadcast anti-join against a ~2%-of-domains blocklist.
7. scrub_pii — the 4-pattern regexp_replace chain, output fully
   materialized via sum(length(scrubbed)).

Usage: python tools/shaping_scale.py [pages_parquet] [cores] [OUT.json] \
           [gram|hash] [all|shaping|hygiene|fuzzy]
Prints one JSON document (and writes OUT.json if given). The 4th arg
selects the decontamination join key (default gram; hash = the
documented scale path, xxhash64 over the token-array slice); the 5th
restricts which phase group runs (default all; fuzzy = the
MinHash-LSH near-dup decontamination pair).
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
    phases = sys.argv[5] if len(sys.argv) > 5 else "all"

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
    res: dict = {"input": pages_path, "cores": cores, "join_on": join_on,
                 "phases": phases}
    n_docs = corpus.count()
    res["n_docs"] = n_docs
    res["n_eval"] = ev.count()

    if phases in ("all", "shaping"):
        _shaping_phases(spark, corpus, ev, n_docs, join_on, res)
    if phases in ("all", "hygiene"):
        _hygiene_phases(spark, corpus, n_docs, res)
    if phases in ("all", "fuzzy"):
        _fuzzy_phases(spark, corpus, ev, n_docs, res)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()
    return 0


def _shaping_phases(spark, corpus, ev, n_docs, join_on, res) -> None:
    import time

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


def _fuzzy_phases(spark, corpus, ev, n_docs, res) -> None:
    """Fuzzy (MinHash-LSH) decontamination, timed standalone. The cost
    shape is two corpus map passes (bands: shingle+minhash UDF; verify:
    sets UDF on candidate rows only) + broadcast probes — the corpus is
    never shuffled, so at fixed input this should scale like the
    signature stage (map-heavy), not like a shuffle-bound stage."""
    import json
    import time

    from dedupe_trees_spark.operators.decontaminate import (
        fuzzy_contamination_report,
        fuzzy_decontaminate,
    )

    # JVM codegen + python-UDF worker-pool warmup (protocol: the timed
    # section must not pay first-evaluation JIT/fork costs — measured
    # 2x on the first fuzzy phase of a fresh session at 8 cores).
    # sample() keeps the input's partitioning so EVERY worker slot
    # forks + imports + JITs (limit() collapses to one partition and
    # warms a single worker — measured 3.2x spread on the first
    # full-scale phase with that variant).
    fuzzy_contamination_report(
        corpus.sample(0.02, seed=1), ev.sample(0.2, seed=1), tau=0.8,
        id_col="url",
    ).filter("contaminated").count()

    t0 = time.time()
    rep = fuzzy_contamination_report(corpus, ev, tau=0.8, id_col="url")
    n_contam = rep.filter("contaminated").count()
    wall = time.time() - t0
    res["fuzzy_report"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "contaminated_docs": n_contam,
    }
    print(json.dumps({"phase": "fuzzy_report", **res["fuzzy_report"]}), flush=True)

    t0 = time.time()
    n_kept = fuzzy_decontaminate(corpus, ev, tau=0.8, id_col="url").count()
    wall = time.time() - t0
    res["fuzzy_decontaminate"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "kept_docs": n_kept,
    }
    print(json.dumps({"phase": "fuzzy_decontaminate", **res["fuzzy_decontaminate"]}), flush=True)


def _hygiene_phases(spark, corpus, n_docs, res) -> None:
    """The r4 hygiene battery, each phase timed standalone. All three
    are corpus-scan maps (the blocklist side is broadcast), so at a
    fixed input their wall should track the pure-CPU control, not the
    shuffle-bound pipeline stages."""
    import json
    import time

    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.domains import block_urls, extract_domain
    from dedupe_trees_spark.operators.pii import scrub_pii
    from dedupe_trees_spark.operators.textstats import gopher_rules

    t0 = time.time()
    flags = gopher_rules(corpus, text_col="text", min_words=10)
    agg = flags.agg(
        F.sum(F.col("gopher_keep").cast("long")).alias("kept"),
        F.sum(F.col("flag_stop").cast("long")).alias("stop_pass"),
    ).collect()[0]
    wall = time.time() - t0
    res["gopher"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "kept_docs": int(agg["kept"] or 0),
        "stop_pass": int(agg["stop_pass"] or 0),
    }
    print(json.dumps({"phase": "gopher", **res["gopher"]}), flush=True)

    # blocklist = a deterministic ~2% sample of the corpus's own
    # registered domains (realistic shape: list tiny vs corpus)
    bl = (
        corpus.select(extract_domain("url").alias("_blocked_domain"))
        .dropDuplicates(["_blocked_domain"])
        .filter(F.xxhash64("_blocked_domain") % 50 == 0)
    )
    n_blocked_domains = bl.count()
    t0 = time.time()
    n_kept = block_urls(corpus, blocked_domains=bl, url_col="url").count()
    wall = time.time() - t0
    res["blocklist"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "kept_docs": n_kept,
        "blocked_domains": n_blocked_domains,
    }
    print(json.dumps({"phase": "blocklist", **res["blocklist"]}), flush=True)

    t0 = time.time()
    total = corpus.select(
        F.sum(F.length(scrub_pii("text"))).alias("n")
    ).collect()[0]["n"]
    wall = time.time() - t0
    res["pii"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "scrubbed_chars": int(total),
    }
    print(json.dumps({"phase": "pii", **res["pii"]}), flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
