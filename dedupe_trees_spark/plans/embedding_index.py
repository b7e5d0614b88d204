"""Incremental (delta-batch) SEMANTIC dedup against a persistent
embedding index — the embedding-family twin of ``plans/incremental.py``.

At 10^12 documents a new crawl's embeddings (10^8–10^10 vectors) must
dedup against the already-clustered corpus with batch-proportional
work. The index is two tables under ``index_dir``:

    vectors/      (vec_id, embedding, component_id)   [rewrite per batch]
    emb_buckets/  (bucket, vec_id) — the persisted SRP bucket table
                                                       [append per batch]

``init_embedding_index`` = one ``neardup_pairs`` (mode="all") + CC run,
then persist both tables. ``update_embedding_index`` per new batch:

1. already-indexed vec_ids are dropped (idempotent re-ingest);
2. candidates = new×new (slim bucket self-join over the batch's
   buckets) ∪ new×index (the batch's bucket KEYS broadcast against the
   persisted bucket table — only matching index rows are read);
3. exact-cosine verify attaches vectors per unique candidate pair
   (batch side from the delta, index side joined by id — the slim-key
   rule from operators/similarity.py);
4. index endpoints collapse to their component roots; CC runs over the
   SUBGRAPH of new ids + touched roots. Labels are min-ids and min is
   associative, so the relabeled components equal a from-scratch run
   over the union (same parity theorem as the text module, proven by
   ``tests/test_embedding_index.py``). Index-index pairs need no
   re-scoring: members of one component are already connected, and
   cross-component index pairs were < tau when both sides were indexed.

Commit protocol: the compute phase stages the batch's bucket rows and
the COMPLETE new vectors table under ``_ebatch_<id>/``; commit then
(a) swaps vectors via ``replace_dir``, (b) appends the staged bucket
rows with a per-batch file prefix (prefix-idempotent), (c) drops the
``_BATCH_<id>`` marker (inside the APPEND-ONLY bucket stage — the
vectors dir is rewritten per batch, so markers there would not
survive the next update) and deletes the staging dir. Every step is
guarded by existence checks, so a crash anywhere converges by
re-running the same call; a completed batch is a no-op.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedupe_trees_spark.io import (
    append_stage,
    mark,
    marked,
    read_stage,
    remove_dir,
    replace_dir,
    stage_done,
    stage_path,
    write_stage,
)
from dedupe_trees_spark.operators.components import assign_components
from dedupe_trees_spark.operators.similarity import (
    cosine_prenormed,
    l2_norm,
    neardup_pairs,
    srp_udf,
)

VEC = "vectors"
BK = "emb_buckets"


def _bucket_rows(
    df: DataFrame, dim: int, n_bits: int, n_tables: int, seed: int
) -> DataFrame:
    srp = srp_udf(dim, n_bits, n_tables, seed)
    return df.select(
        "vec_id", F.explode(srp(F.col("embedding"))).alias("bucket")
    )


def _verify(cands: DataFrame, vecs: DataFrame, tau: float) -> DataFrame:
    """Exact-cosine filter of slim (id_a, id_b) pairs; vectors attach
    once per unique pair (the measured 11.6× rule)."""
    v = vecs.select(
        "vec_id",
        F.col("embedding").alias("_v"),
        l2_norm(F.col("embedding")).alias("_n"),
    )
    out = (
        cands.join(
            v.select(
                F.col("vec_id").alias("id_a"),
                F.col("_v").alias("_va"), F.col("_n").alias("_na"),
            ),
            "id_a",
        )
        .join(
            v.select(
                F.col("vec_id").alias("id_b"),
                F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
            ),
            "id_b",
        )
        .withColumn(
            "cos_sim",
            cosine_prenormed(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ).cast("double"),
        )
    )
    return out.filter(F.col("cos_sim") >= tau).select("id_a", "id_b")


def init_embedding_index(
    spark: SparkSession,
    vectors: DataFrame,
    index_dir: str,
    tau: float = 0.9,
    dim: int = 64,
    n_bits: int = 16,
    n_tables: int = 8,
    seed: int = 42,
) -> dict:
    """Cluster ``vectors`` (vec_id, embedding) from scratch and persist
    the index. Config params must be repeated verbatim on every update
    (bucket identity depends on them)."""
    t0 = time.time()
    pairs = neardup_pairs(
        vectors, tau=tau, dim=dim, n_bits=n_bits,
        n_tables=n_tables, seed=seed, mode="all",
    )
    comps = assign_components(
        vectors.select("vec_id"), pairs, id_col="vec_id", a="id_a", b="id_b"
    )
    write_stage(vectors.join(comps, "vec_id"), index_dir, VEC)
    write_stage(
        _bucket_rows(vectors, dim, n_bits, n_tables, seed), index_dir, BK
    )
    return {"indexed": read_stage(spark, index_dir, VEC).count(),
            "wall_sec": round(time.time() - t0, 1)}


def update_embedding_index(
    spark: SparkSession,
    delta: DataFrame,
    index_dir: str,
    batch_id: str,
    tau: float = 0.9,
    dim: int = 64,
    n_bits: int = 16,
    n_tables: int = 8,
    seed: int = 42,
) -> dict:
    """Fold one batch of (vec_id, embedding) rows into the index."""
    t0 = time.time()
    if marked(index_dir, BK, f"_BATCH_{batch_id}"):
        return {"batch": batch_id, "skipped": True}
    stage_dir = f"{index_dir}/_ebatch_{batch_id}"

    if not stage_done(stage_dir, "vectors_full") and not stage_done(
        stage_dir, "delta_bk"
    ):
        idx = read_stage(spark, index_dir, VEC)
        new = delta.join(idx.select("vec_id"), "vec_id", "left_anti")
        dbk = _bucket_rows(new, dim, n_bits, n_tables, seed)
        # new×new candidates: slim self-join over the batch's buckets
        dd = (
            dbk.select("bucket", F.col("vec_id").alias("id_a"))
            .join(dbk.select("bucket", F.col("vec_id").alias("id_b")), "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
        )
        # new×index: broadcast the batch's bucket KEYS against the
        # persisted table — index rows are scanned, never shuffled
        keys = dbk.select("bucket").dropDuplicates(["bucket"])
        touched_bk = read_stage(spark, index_dir, BK).join(
            F.broadcast(keys), "bucket"
        )
        di = dbk.select("bucket", F.col("vec_id").alias("id_a")).join(
            touched_bk.select("bucket", F.col("vec_id").alias("id_b")),
            "bucket",
        )
        cands = (
            dd.unionByName(di)
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        allvec = idx.select("vec_id", "embedding").unionByName(
            new.select("vec_id", "embedding")
        )
        edges = _verify(cands, allvec, tau)
        # collapse index endpoints to their component roots
        lab = idx.select("vec_id", "component_id")
        e2 = (
            edges.join(
                lab.withColumnRenamed("vec_id", "id_a")
                .withColumnRenamed("component_id", "_ca"),
                "id_a", "left",
            )
            .join(
                lab.withColumnRenamed("vec_id", "id_b")
                .withColumnRenamed("component_id", "_cb"),
                "id_b", "left",
            )
            .select(
                F.coalesce("_ca", "id_a").alias("ra"),
                F.coalesce("_cb", "id_b").alias("rb"),
            )
        )
        nodes = new.select("vec_id").unionByName(
            e2.select(F.col("ra").alias("vec_id"))
        ).unionByName(e2.select(F.col("rb").alias("vec_id"))).dropDuplicates(
            ["vec_id"]
        )
        sub = assign_components(nodes, e2, id_col="vec_id", a="ra", b="rb")
        # new rows: their subgraph label (or themselves if isolated)
        delta_vec = (
            new.join(sub, "vec_id", "left")
            .select(
                "vec_id", "embedding",
                F.coalesce("component_id", "vec_id").alias("component_id"),
            )
        )
        # touched index roots that changed label → relabel map
        relabel = (
            sub.join(
                idx.select(F.col("component_id").alias("vec_id")).dropDuplicates(
                    ["vec_id"]
                ),
                "vec_id",
            )
            .filter(F.col("component_id") != F.col("vec_id"))
            .select(
                F.col("vec_id").alias("old_comp"),
                F.col("component_id").alias("new_comp"),
            )
        )
        vectors_full = (
            idx.join(
                relabel, idx["component_id"] == relabel["old_comp"], "left"
            )
            .select(
                idx["vec_id"], idx["embedding"],
                F.coalesce("new_comp", idx["component_id"]).alias(
                    "component_id"
                ),
            )
            .unionByName(delta_vec)
        )
        write_stage(dbk, stage_dir, "delta_bk")
        write_stage(vectors_full, stage_dir, "vectors_full")

    # ---- commit (each step guarded, idempotent) ------------------------
    if stage_done(stage_dir, "vectors_full"):
        replace_dir(
            spark, stage_path(stage_dir, "vectors_full"),
            stage_path(index_dir, VEC),
        )
    if stage_done(stage_dir, "delta_bk"):
        append_stage(
            spark, stage_path(stage_dir, "delta_bk"),
            stage_path(index_dir, BK), prefix=f"b{batch_id}",
        )
    mark(index_dir, BK, f"_BATCH_{batch_id}")
    remove_dir(spark, stage_dir)
    n = read_stage(spark, index_dir, VEC).count()
    return {"batch": batch_id, "indexed": n,
            "wall_sec": round(time.time() - t0, 1)}
