#!/usr/bin/env python
"""spark-submit entrypoint for the incremental SEMANTIC dedup index
(plans/embedding_index.py):

    # build the index from a (vec_id, embedding) parquet table
    spark-submit --py-files dedupe_trees_spark.zip run_embedding_index.py \
        --init --input /data/embeddings_2026_01 --index /ckpt/emb_index

    # fold each later embedding batch in (batch-proportional work)
    spark-submit --py-files dedupe_trees_spark.zip run_embedding_index.py \
        --input /data/embeddings_2026_02 --index /ckpt/emb_index --batch 2026-02

SRP/verify config (--tau --dim --n-bits --n-tables --seed) must be
repeated verbatim on every call against the same index: the persisted
bucket table's identity depends on it. A completed batch id is a no-op
and a batch interrupted mid-commit converges when re-run — see the
commit protocol in plans/embedding_index.py.
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    def pop_opt(name, default=None):
        if name in argv:
            i = argv.index(name)
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return default

    def pop_flag(name) -> bool:
        if name in argv:
            argv.remove(name)
            return True
        return False

    master = pop_opt("--master")
    input_path = pop_opt("--input")
    index_dir = pop_opt("--index")
    batch_id = pop_opt("--batch")
    do_init = pop_flag("--init")
    cfg = {
        "tau": float(pop_opt("--tau", "0.9")),
        "dim": int(pop_opt("--dim", "64")),
        "n_bits": int(pop_opt("--n-bits", "16")),
        "n_tables": int(pop_opt("--n-tables", "8")),
        "seed": int(pop_opt("--seed", "42")),
    }
    if not input_path or not index_dir:
        print(
            "run_embedding_index: --input DIR and --index DIR are required",
            file=sys.stderr,
        )
        return 2
    if not do_init and not batch_id:
        print(
            "run_embedding_index: --batch ID is required unless --init",
            file=sys.stderr,
        )
        return 2
    if argv:
        print(f"run_embedding_index: unknown args {argv}", file=sys.stderr)
        return 2

    from dedupe_trees_spark.plans.embedding_index import (
        init_embedding_index,
        update_embedding_index,
    )
    from dedupe_trees_spark.session import get_spark

    spark = get_spark(app_name="embedding_index", master=master)
    vectors = spark.read.parquet(input_path).select("vec_id", "embedding")
    if do_init:
        rep = init_embedding_index(spark, vectors, index_dir, **cfg)
    else:
        rep = update_embedding_index(spark, vectors, index_dir, batch_id, **cfg)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
