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


def test_sample_frames_fanout_and_determinism(spark):
    import zlib

    from dedupe_trees_spark.operators.multimodal import sample_frames

    payload = bytes(range(256)) * 5  # 1280 bytes → frames of 256: 5 frames
    df = spark.createDataFrame([("u1", payload)], "url string, payload binary")
    rows = {r["frame_idx"]: r for r in sample_frames(
        df, binary_col="payload", frame_size=256, every=2
    ).collect()}
    assert sorted(rows) == [0, 2, 4]
    assert all(rows[i]["frame_len"] == 256 for i in rows)
    assert rows[0]["frame_crc"] == zlib.crc32(payload[:256])


def test_resize_media_bounds_and_stub_guard(spark):
    import pytest

    from dedupe_trees_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [("a", b"x" * 10_000), ("b", b"y" * 50)], "url string, payload binary"
    )
    out = {r["url"]: r for r in resize_media(
        df, binary_col="payload", target_len=256
    ).collect()}
    assert out["a"]["resized_len"] <= 256
    assert out["b"]["resized_len"] == 50  # already smaller than target
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        resize_media(df, binary_col="payload", real_decoder=True).collect()
