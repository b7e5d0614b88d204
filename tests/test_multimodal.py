from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_trees_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_batch,
    extract_media_meta,
)


def _df(spark):
    rows = [("u1", b"\x89PNG fake bytes"), ("u2", b"")]
    return spark.createDataFrame(rows, ["url", "payload"])


def test_extract_media_meta_schema_and_values(spark):
    out = extract_media_meta(_df(spark), binary_col="payload").collect()
    by_url = {r["url"]: r for r in out}
    assert by_url["u1"]["byte_len"] == 15
    assert by_url["u2"]["byte_len"] == 0
    assert len(by_url["u1"]["feature"]) == FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in by_url["u1"]["feature"])


def test_decode_deterministic(spark):
    a = extract_media_meta(_df(spark), binary_col="payload").collect()
    b = extract_media_meta(_df(spark), binary_col="payload").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_real_decoder_is_stubbed(spark):
    import pandas as pd

    with pytest.raises(NotImplementedError):
        decode_batch(
            pd.DataFrame({"url": ["u"], "payload": [b"x"]}),
            "payload",
            real_decoder=True,
        )
