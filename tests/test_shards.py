"""Shard packing: distributed prefix sum vs the window twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_trees_spark.operators.shards import pack_shards, pack_shards_window

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


def test_pack_shards_matches_window_twin(spark):
    d = _docs(spark)
    a = pack_shards(d, 5000, id_col="doc_id")
    b = pack_shards_window(d, 5000, id_col="doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_shards_partition_count_invariant(spark):
    d = _docs(spark)
    a = pack_shards(d, 3000, num_parts=2).orderBy("doc_id").collect()
    b = pack_shards(d, 3000, num_parts=17).orderBy("doc_id").collect()
    assert a == b


def test_pack_shards_invariants(spark):
    d = _docs(spark)
    out = pack_shards(d, 4000).persist()
    # cum_before is a true exclusive prefix sum: total matches; shards
    # are contiguous (every doc here is < target tokens) and each
    # non-final shard's token sum sits within max_doc of the target —
    # docs are never split, so a shard can over/undershoot by at most
    # one boundary document.
    tot = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert out.agg(F.max(F.col("cum_before") + F.col("n_tokens"))).collect()[0][0] == tot
    max_doc = out.agg(F.max("n_tokens")).collect()[0][0]
    assert max_doc < 4000
    sums = (
        out.groupBy("shard_id").agg(F.sum("n_tokens").alias("s"))
        .orderBy("shard_id").collect()
    )
    ids = [r["shard_id"] for r in sums]
    assert ids == list(range(len(ids)))
    assert all(abs(r["s"] - 4000) < max_doc for r in sums[:-1])
    out.unpersist()


def test_pack_shards_precomputed_token_col(spark):
    d = _docs(spark).withColumn("ntok", F.size(F.split("text", " ")))
    a = pack_shards(d, 5000, token_col="ntok")
    b = pack_shards(d, 5000)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_shards_rejects_bad_target(spark):
    with pytest.raises(ValueError):
        pack_shards(_docs(spark), 0)


def test_pack_shards_plan_has_no_single_partition_exchange(spark):
    """The whole point: the textbook window funnels the corpus through
    Exchange SinglePartition; the distributed scan must not."""
    d = _docs(spark)
    good = pack_shards(d, 5000)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in good
    bad = pack_shards_window(d, 5000)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" in bad
