"""PII scrubbing: handcrafted cases, count parity, plan shape."""

from pyspark.sql import functions as F

from dedupe_trees_spark.operators.pii import PII_PATTERNS, scrub_pii_report


CASES = [
    # (raw, scrubbed, n_emails, n_ips, n_ssns, n_phones)
    ("mail me at bob.smith+x@sub.example.co", "mail me at <EMAIL>", 1, 0, 0, 0),
    ("server 192.168.0.1 and 10.0.0.255.", "server <IP_ADDRESS> and <IP_ADDRESS>.", 0, 2, 0, 0),
    ("ssn 123-45-6789 end", "ssn <SSN> end", 0, 0, 1, 0),
    ("call 555-867-5309 now", "call <PHONE> now", 0, 0, 0, 1),
    # phone is not an SSN and vice versa (dash-shape mutually exclusive)
    ("123-45-6789 555-867-5309", "<SSN> <PHONE>", 0, 0, 1, 1),
    # email local part with digits does not leak into numeric patterns
    ("a1.2.3.4@x.io", "<EMAIL>", 1, 0, 0, 0),
    # version-ish dotted quad inside a word is NOT an IP (\b anchors)
    ("v1.2.3.4beta", "v1.2.3.4beta", 0, 0, 0, 0),
    ("no pii here", "no pii here", 0, 0, 0, 0),
    ("", "", 0, 0, 0, 0),
]


def test_scrub_pii_handcrafted(spark):
    rows = [(i, raw) for i, (raw, *_) in enumerate(CASES)]
    d = spark.createDataFrame(rows, ["i", "text"])
    out = scrub_pii_report(d).orderBy("i").collect()
    for row, (raw, want, ne, ni, ns, np_) in zip(out, CASES):
        assert row["text_scrubbed"] == want, raw
        assert (row["n_emails"], row["n_ips"], row["n_ssns"], row["n_phones"]) == (
            ne, ni, ns, np_,
        ), raw


def test_scrub_is_map_only(spark):
    d = spark.range(100).withColumn("text", F.concat(F.lit("x@y.io "), F.col("id").cast("string")))
    out = scrub_pii_report(d)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pattern_table_is_single_source(spark):
    # every kind in the table surfaces as a count column and a token
    d = spark.createDataFrame([(1, "x")], ["i", "text"])
    cols = set(scrub_pii_report(d).columns)
    for kind, _, token in PII_PATTERNS:
        assert f"n_{kind}s" in cols
        assert token.startswith("<") and token.endswith(">")
