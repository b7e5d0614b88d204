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
