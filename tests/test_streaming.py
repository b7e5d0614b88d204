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
