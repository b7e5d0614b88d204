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
