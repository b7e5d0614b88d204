from __future__ import annotations

import pytest

from dedupe_trees_spark.catalog import (
    PAGES_COLUMNS,
    catalog_configured,
    ensure_pages_table,
    iceberg_session_conf,
    pages_table_ddl,
)


def test_iceberg_session_conf_keys():
    conf = iceberg_session_conf(catalog="cc", warehouse="s3://bkt/wh", catalog_type="hive")
    assert conf["spark.sql.catalog.cc"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.cc.type"] == "hive"
    assert conf["spark.sql.catalog.cc.warehouse"] == "s3://bkt/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_pages_table_ddl_shape():
    ddl = pages_table_ddl("dedupe.web.pages", url_buckets=128)
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (days(warc_ts), bucket(128, url))" in ddl
    assert "'format-version' = '2'" in ddl
    for name, typ in PAGES_COLUMNS:
        assert f"{name} {typ}" in ddl


def test_ensure_pages_table_requires_catalog(spark):
    # no iceberg jar/catalog in this sandbox: the guard must refuse and
    # surface the DDL instead of half-creating something
    assert not catalog_configured(spark, "dedupe")
    with pytest.raises(RuntimeError, match="not configured"):
        ensure_pages_table(spark, "dedupe.web.pages")
