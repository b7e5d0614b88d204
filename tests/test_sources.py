from __future__ import annotations

import base64
import datetime
import json

from dedupe_trees_spark.sources import read_pages_csv, read_pages_jsonl


def test_read_pages_jsonl(spark, tmp_path):
    p = tmp_path / "pages.jsonl"
    rows = [
        {
            "url": "https://a.example/x.html",
            "warc_ts": "2024-01-01T00:00:00Z",
            "html": base64.b64encode(b"<html>hi</html>").decode(),
            "text": "hi",
            "lang": "en",
            "source": "src0",
            "source_order": 0,
        }
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out = read_pages_jsonl(spark, str(p)).collect()
    assert out[0]["html"] == b"<html>hi</html>"
    assert out[0]["url"] == "https://a.example/x.html"
    assert out[0]["warc_ts"] == datetime.datetime(2024, 1, 1)


def test_read_pages_csv(spark, tmp_path):
    p = tmp_path / "pages.csv"
    p.write_text(
        "url,warc_ts,text,lang,source,source_order\n"
        "https://a.example/x.html,2024-01-01T00:00:00Z,hello world,en,src0,0\n"
    )
    out = read_pages_csv(spark, str(p)).collect()
    assert out[0]["text"] == "hello world"
    assert out[0]["html"] is None
    assert out[0]["source_order"] == 0


def _warc_fixture_records():
    from datetime import datetime, timezone

    ts = datetime(2024, 3, 5, 12, 30, 0, tzinfo=timezone.utc)
    html_a = b"<html><body>alpha <b>page</b> &amp; more</body></html>"
    html_b = b"<html><script>x()</script><p>beta page</p></html>"
    return [
        # warcinfo record must be skipped
        {"url": "ignored", "warc_type": "warcinfo", "html": b"software: test"},
        {"url": "https://a.example/alpha", "warc_ts": ts, "html": html_a},
        # request record for the same URI must be skipped
        {"url": "https://b.example/beta", "warc_type": "request", "html": b"GET /"},
        # HTTP-wrapped response (the Common-Crawl layout)
        {
            "url": "https://b.example/beta",
            "warc_ts": ts,
            "html": html_b,
            "http_wrap": True,
        },
    ]


def test_read_pages_warc_roundtrip(spark, tmp_path):
    from dedupe_trees_spark.sources.warc import read_pages_warc, write_warc

    p = tmp_path / "crawl-00000.warc"
    write_warc(_warc_fixture_records(), str(p))
    out = {r["url"]: r for r in read_pages_warc(spark, str(p)).collect()}

    # only the two response records survive; payload bytes exact
    assert set(out) == {"https://a.example/alpha", "https://b.example/beta"}
    a, b = out["https://a.example/alpha"], out["https://b.example/beta"]
    assert a["html"] == b"<html><body>alpha <b>page</b> &amp; more</body></html>"
    # HTTP wrapper stripped: payload only
    assert b["html"] == b"<html><script>x()</script><p>beta page</p></html>"
    # shared codegen extraction: same rules as the parquet path
    assert a["text"] == "alpha page & more"
    assert b["text"] == "beta page"
    assert a["warc_ts"] == datetime.datetime(2024, 3, 5, 12, 30)
    assert a["source"] == "crawl-00000.warc"
    # source_order = record index within the file (responses only)
    assert (a["source_order"], b["source_order"]) == (0, 1)


def test_read_pages_warc_gzip_members(spark, tmp_path):
    """Member-per-record gzip (Common Crawl's layout) and whole-file gzip
    both decompress through gzip.decompress's multi-member walk."""
    import gzip as _gz

    from dedupe_trees_spark.sources.warc import read_pages_warc, warc_bytes

    recs = _warc_fixture_records()
    per_member = b"".join(_gz.compress(warc_bytes([r]), mtime=0) for r in recs)
    p = tmp_path / "crawl-00001.warc.gz"
    p.write_bytes(per_member)
    out = read_pages_warc(spark, str(p)).collect()
    assert sorted(r["url"] for r in out) == [
        "https://a.example/alpha",
        "https://b.example/beta",
    ]
    assert all(r["text"] for r in out)


def test_read_pages_warc_schema_and_dispatch(spark, tmp_path):
    from dedupe_trees_spark.sources import PAGES_SCHEMA, read_pages_any
    from dedupe_trees_spark.sources.warc import write_warc

    p = tmp_path / "crawl-00002.warc"
    write_warc(_warc_fixture_records(), str(p))
    df = read_pages_any(spark, str(p))
    assert [f.name for f in df.schema.fields] == [f.name for f in PAGES_SCHEMA]
    assert df.count() == 2


def test_warc_pages_run_the_pipeline(spark, tmp_path):
    """WARC-sourced pages flow through S1 signatures unchanged — the
    ingest edge produces real pipeline input, not a lookalike."""
    from datetime import datetime, timezone

    from dedupe_trees_spark.sources.warc import read_pages_warc, write_warc

    ts = datetime(2024, 3, 5, tzinfo=timezone.utc)
    body = b"<p>" + b"shared prose for the dedup pipeline " * 8 + b"</p>"
    recs = [
        {"url": f"https://site{i}.example/dup", "warc_ts": ts, "html": body}
        for i in range(3)
    ]
    p = tmp_path / "crawl-00003.warc"
    write_warc(recs, str(p))

    from dedupe_trees_spark.config import PipelineConfig
    from dedupe_trees_spark.plans.pipeline import DedupePipeline

    cfg = PipelineConfig(input_path=str(p), ckpt_dir=str(tmp_path / "ckpt"))
    pipe = DedupePipeline(spark, cfg)
    pipe.run()
    # three byte-identical pages collapse to one survivor
    assert pipe.canonical().filter("is_canonical").count() == 1


def test_write_pages_warc_distributed_roundtrip(spark, tmp_path):
    """Export sink inverse property: pages -> write_pages_warc (one file
    per hash partition, executor-side) -> read_pages_warc == the input
    on (url, warc_ts, html bytes, extracted text)."""
    from dedupe_trees_spark.sources.warc import read_pages_warc, write_pages_warc
    from pyspark.sql import functions as F

    pages = spark.range(0, 50).select(
        F.concat(F.lit("https://e.example/p"), F.col("id")).alias("url"),
        F.expr(
            "timestamp'2026-02-01 00:00:00' + make_dt_interval(0, 0, 0, id)"
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<body>doc "), F.col("id"), F.lit(" &amp; tail</body>")),
            "UTF-8",
        ).alias("html"),
    )
    out_dir = str(tmp_path / "export")
    manifest = write_pages_warc(pages, out_dir, files=4).collect()
    assert sum(m["n_records"] for m in manifest) == 50
    assert 1 <= len(manifest) <= 4 and all(m["file"].endswith(".warc.gz") for m in manifest)

    back = read_pages_warc(spark, f"{out_dir}/*.warc.gz")
    orig = {r["url"]: r for r in pages.collect()}
    got = {r["url"]: r for r in back.collect()}
    assert set(got) == set(orig)
    for url, r in got.items():
        assert bytes(r["html"]) == bytes(orig[url]["html"])
        assert r["warc_ts"] == orig[url]["warc_ts"]
        assert r["text"] == f"doc {url.rsplit('p', 1)[1]} & tail"


def test_write_pages_warc_text_fallback_and_plain(spark, tmp_path):
    """html-less corpora export via the UTF-8 text fallback; compress=False
    writes plain .warc; http_wrap=False stores the body bare."""
    from dedupe_trees_spark.sources.warc import read_pages_warc, write_pages_warc
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [("https://t.example/a", "alpha body"), ("https://t.example/b", "beta body")],
        ["url", "text"],
    ).withColumn("warc_ts", F.lit("2026-03-01 00:00:00").cast("timestamp"))
    out_dir = str(tmp_path / "plain")
    m = write_pages_warc(
        pages, out_dir, files=1, http_wrap=False, compress=False
    ).collect()
    assert len(m) == 1 and m[0]["file"].endswith(".warc")
    raw = open(m[0]["file"], "rb").read()
    assert raw.startswith(b"WARC/1.0") and b"alpha body" in raw
    got = {r["url"]: r["text"] for r in read_pages_warc(spark, m[0]["file"]).collect()}
    assert got == {"https://t.example/a": "alpha body", "https://t.example/b": "beta body"}
