"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested; the actual media decode
is STUBBED deterministically (no image/audio libraries ship in this
container): ``decode_stub`` derives a fake feature vector from the byte
content via hashing, and raises ``NotImplementedError`` when a real
decoder is requested.

At scale the pattern is: keep binaries in their own column, select them
ONLY inside the mapInPandas stage (column pruning keeps every other
stage binary-free), size Arrow batches by bytes not rows.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "url string, media_type string, byte_len long, content_crc long, "
    "feature array<float>"
)

FEATURE_DIM = 8


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder's embedding output."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 4], dtype=np.uint32)
    return (arr.astype(np.float32) / np.float32(2**32)).astype(np.float32)


def decode_batch(pdf: pd.DataFrame, binary_col: str, real_decoder: bool = False) -> pd.DataFrame:
    if real_decoder:
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present in "
            "this container; wire a decoder here (same batch shape)"
        )
    payloads = pdf[binary_col]
    return pd.DataFrame(
        {
            "url": pdf["url"],
            "media_type": pdf.get("media_type", pd.Series(["binary"] * len(pdf))),
            "byte_len": payloads.map(len).astype("int64"),
            "content_crc": payloads.map(lambda b: zlib.crc32(b)).astype("int64"),
            "feature": payloads.map(_fake_feature),
        }
    )


def extract_media_meta(
    df: DataFrame, binary_col: str = "html", real_decoder: bool = False
) -> DataFrame:
    """binary column → typed metadata + (stub) feature vector.

    mapInPandas so one Arrow batch of binaries is decoded per call —
    the exact shape a real CPU/GPU decode stage would use.
    """
    cols = ["url", binary_col] + (["media_type"] if "media_type" in df.columns else [])
    src = df.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_batch(pdf, binary_col, real_decoder)

    return src.mapInPandas(run, schema=MEDIA_META_SCHEMA)
