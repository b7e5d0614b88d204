from __future__ import annotations

import datetime

from dedupe_trees_spark.streaming.dedup_stream import incremental_exact_dedup

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def test_incremental_exact_dedup(spark, tmp_path):
    inp = str(tmp_path / "stream_in")
    rows = [
        ("u1", TS, b"", "same text", "en", "src0", 0),
        ("u2", TS, b"", "same text", "en", "src1", 1),   # exact dup of u1
        ("u3", TS, b"", "other text", "en", "src0", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string, "
        "source string, source_order int",
    )
    df.write.mode("overwrite").parquet(inp)

    deduped = incremental_exact_dedup(spark, inp)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT url FROM dedup_out").collect()
    finally:
        q.stop()
    urls = sorted(r["url"] for r in out)
    # exactly one of (u1, u2) survives + u3
    assert len(urls) == 2 and "u3" in urls
    assert urls[0] in ("u1", "u2")


def test_windowed_event_counts_matches_batch_oracle(spark, tmp_path):
    """Streaming windowed agg == batch twin on the same data (engine vs
    oracle diff via exceptAll both ways)."""
    from dedupe_trees_spark.streaming.windowed import (
        windowed_event_counts,
        windowed_event_counts_batch,
    )

    inp = str(tmp_path / "events_in")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=3 * i), i % 5,
         ["click", "view", "error"][i % 3], float(i), "{}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(inp)

    stream = windowed_event_counts(spark, inp, window="10 minutes", watermark="5 minutes")
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM win_out")
        want = windowed_event_counts_batch(spark.read.parquet(inp), window="10 minutes")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        assert want.count() > 0
    finally:
        q.stop()


def test_source_dup_rate_stateful_stream(spark, tmp_path):
    """applyInPandasWithState: per-source dup counters accumulate ACROSS
    micro-batches (state carries), duplicates within and across batches
    are counted, distinct sources keep independent state."""
    from dedupe_trees_spark.streaming.stateful import source_dup_rate_stream

    inp = tmp_path / "stateful_in"
    inp.mkdir()
    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string, "
        "source string, source_order int"
    )

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(inp / name))

    # batch 1: src0 has an in-batch dup; src1 unique
    write_batch("b1", [
        ("u1", TS, b"", "aaa", "en", "src0", 0),
        ("u2", TS, b"", "aaa", "en", "src0", 0),
        ("u3", TS, b"", "bbb", "en", "src1", 1),
    ])

    # state_ttl=None → NoTimeout: processing-time timeout wake-ups would
    # keep scheduling micro-batches and processAllAvailable never settles
    stream = source_dup_rate_stream(spark, str(inp) + "/*", max_hashes=100, state_ttl=None)
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("dup_rate_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: src0 replays "aaa" (cross-batch dup) + one new doc
        write_batch("b2", [
            ("u4", TS, b"", "aaa", "en", "src0", 0),
            ("u5", TS, b"", "ccc", "en", "src0", 0),
        ])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM dup_rate_out ORDER BY total_docs"
        ).collect()
    finally:
        q.stop()
    by_src = {}
    for r in rows:  # last update per source wins (ordered by total_docs)
        by_src[r["source"]] = r
    assert by_src["src1"]["total_docs"] == 1 and by_src["src1"]["total_dups"] == 0
    s0 = by_src["src0"]
    assert s0["total_docs"] == 4          # u1,u2 + u4,u5
    assert s0["total_dups"] == 2          # u2 (in-batch) + u4 (cross-batch)
    assert s0["batch_docs"] == 2 and s0["batch_dups"] == 1


def test_duration_ms_units_and_errors():
    from dedupe_trees_spark.streaming.stateful import _duration_ms

    assert _duration_ms("250 ms") == 250
    assert _duration_ms("30 seconds") == 30_000
    assert _duration_ms("2 hours") == 7_200_000
    assert _duration_ms("1 day") == 86_400_000
    assert _duration_ms("2 weeks") == 2 * 604_800_000
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported duration unit"):
        _duration_ms("3 months")  # variable-length: deliberately excluded


def test_streaming_neardup_folds_into_index(spark, tmp_path):
    """Near-dup streaming = foreachBatch folds into the incremental
    index. End state must equal the batch pipeline over everything
    ingested (the parity theorem through the streaming glue), and the
    per-epoch batch markers must exist (the exactly-once handle)."""
    import os

    from pyspark.sql import functions as F

    from dedupe_trees_spark.config import PipelineConfig
    from dedupe_trees_spark.datagen import GenConfig, generate_pages
    from dedupe_trees_spark.io import read_stage
    from dedupe_trees_spark.plans.incremental import init_index
    from dedupe_trees_spark.plans.pipeline import DedupePipeline
    from dedupe_trees_spark.streaming.neardup_stream import neardup_index_stream

    root = tmp_path
    all_inp, b1_inp, stream_dir = (
        str(root / d) for d in ("all", "b1", "stream_in")
    )
    ckpt_full, idx_dir = str(root / "ckpt_full"), str(root / "index")
    pages = generate_pages(spark, GenConfig(n_docs=600, seed=13), partitions=4)
    pages.write.mode("overwrite").parquet(all_inp)
    pages = spark.read.parquet(all_inp)
    split = F.pmod(F.xxhash64("url"), F.lit(3))
    pages.filter(split == 0).write.parquet(b1_inp)
    # two stream files -> two micro-batches at maxFilesPerTrigger=1
    pages.filter(split == 1).coalesce(1).write.mode("append").parquet(stream_dir)
    pages.filter(split == 2).coalesce(1).write.mode("append").parquet(stream_dir)

    cfg_idx = PipelineConfig(input_path=b1_inp, ckpt_dir=idx_dir, bucket_cap=64)
    init_index(spark, cfg_idx)
    q = neardup_index_stream(spark, stream_dir, cfg_idx)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    markers = [
        n for n in os.listdir(os.path.join(idx_dir, "signatures"))
        if n.startswith("_BATCH_e")
    ]
    assert len(markers) == 2  # one idempotency marker per micro-batch

    DedupePipeline(
        spark, PipelineConfig(input_path=all_inp, ckpt_dir=ckpt_full, bucket_cap=64)
    ).run()
    full = read_stage(spark, ckpt_full, "canonical")
    incr = read_stage(spark, idx_dir, "canonical")
    assert full.count() == incr.count() == 600
    assert incr.exceptAll(full).count() == 0
    assert full.exceptAll(incr).count() == 0

    # restart with the same stream checkpoint: nothing new -> no-op
    q2 = neardup_index_stream(spark, stream_dir, cfg_idx)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert read_stage(spark, idx_dir, "canonical").count() == 600


def test_streaming_semantic_folds_into_embedding_index(spark, tmp_path):
    """Embedding twin of the near-dup stream test: micro-batches fold
    into the embedding index; drained-stream labels equal a from-scratch
    init over everything ingested; per-epoch markers exist; a restart
    with the same checkpoint is a no-op."""
    import os

    from tests.test_embedding_index import CFG, _vectors
    from dedupe_trees_spark.io import read_stage
    from dedupe_trees_spark.plans.embedding_index import init_embedding_index
    from dedupe_trees_spark.streaming.semantic_stream import (
        semantic_index_stream,
    )

    rows = _vectors(range(0, 210))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    idx_dir = str(tmp_path / "eidx")
    full_dir = str(tmp_path / "efull")
    stream_dir = str(tmp_path / "stream_in")
    init_embedding_index(spark, df.filter("vec_id < 70"), idx_dir, **CFG)
    df.filter("vec_id >= 70 and vec_id < 140").coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)
    df.filter("vec_id >= 140").coalesce(1).write.mode("append").parquet(
        stream_dir
    )

    dim = CFG["dim"]
    q = semantic_index_stream(
        spark, stream_dir, idx_dir,
        schema=f"vec_id long, embedding array<double>",
        tau=CFG["tau"], dim=dim, n_bits=CFG["n_bits"],
        n_tables=CFG["n_tables"], seed=CFG["seed"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    markers = [
        n for n in os.listdir(os.path.join(idx_dir, "emb_buckets"))
        if n.startswith("_BATCH_e")
    ]
    assert len(markers) == 2

    init_embedding_index(spark, df, full_dir, **CFG)
    inc = {
        r["vec_id"]: r["component_id"]
        for r in read_stage(spark, idx_dir, "vectors").collect()
    }
    full = {
        r["vec_id"]: r["component_id"]
        for r in read_stage(spark, full_dir, "vectors").collect()
    }
    assert inc == full and len(inc) == 210

    q2 = semantic_index_stream(
        spark, stream_dir, idx_dir,
        tau=CFG["tau"], dim=dim, n_bits=CFG["n_bits"],
        n_tables=CFG["n_tables"], seed=CFG["seed"],
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert read_stage(spark, idx_dir, "vectors").count() == 210
