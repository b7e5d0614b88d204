"""Adjudicate pair-set drift between two pipeline checkpoints.

When a pairs-stage rewrite changes the `pairs` checkpoint's row count,
this tool localizes the drift instead of leaving it to a rows-only
eyeball: exceptAll in both directions on pair identity, on
(identity, kind), and a canonical kept-set hash comparison — the
invariant that must never move.

Usage: python tools/pairs_drift.py CKPT_A CKPT_B
Prints one JSON line; sample drift rows (≤10 each way) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ckpt_a, ckpt_b = sys.argv[1], sys.argv[2]

    from pyspark.sql import functions as F

    from dedupe_trees_spark.session import get_spark

    spark = get_spark("pairs_drift")
    pa = spark.read.parquet(f"{ckpt_a}/pairs")
    pb = spark.read.parquet(f"{ckpt_b}/pairs")

    ids_a = pa.select("url_a", "url_b")
    ids_b = pb.select("url_a", "url_b")
    only_a = ids_a.exceptAll(ids_b)
    only_b = ids_b.exceptAll(ids_a)
    kinds_a = pa.select("url_a", "url_b", "kind")
    kinds_b = pb.select("url_a", "url_b", "kind")
    kind_drift = kinds_a.exceptAll(kinds_b).count() + kinds_b.exceptAll(kinds_a).count()

    def kept_hash(ckpt):
        df = spark.read.parquet(f"{ckpt}/canonical")
        r = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_canonical").cast("long")).alias("kept"),
            F.bit_xor(F.xxhash64("url", "is_canonical")).alias("h"),
        ).collect()[0]
        return {"n": r["n"], "kept": r["kept"], "hash": r["h"]}

    n_only_a, n_only_b = only_a.count(), only_b.count()
    for name, d in (("only_in_A", only_a), ("only_in_B", only_b)):
        for row in d.limit(10).collect():
            print(f"{name}: {row}", file=sys.stderr)
    ka, kb = kept_hash(ckpt_a), kept_hash(ckpt_b)
    print(
        json.dumps(
            {
                "pairs_a": pa.count(),
                "pairs_b": pb.count(),
                "pair_ids_only_in_a": n_only_a,
                "pair_ids_only_in_b": n_only_b,
                "kind_drift_rows": kind_drift,
                "kept_a": ka,
                "kept_b": kb,
                "kept_identical": ka == kb,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
