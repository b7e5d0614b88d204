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


FRAME_SCHEMA = "url string, frame_idx int, frame_len int, frame_crc long"


def sample_frames(
    df: DataFrame,
    binary_col: str = "html",
    frame_size: int = 1024,
    every: int = 4,
) -> DataFrame:
    """Frame-sampling pattern for video-like binaries: one output row per
    sampled fixed-size frame (indices 0, every, 2·every, …).

    This is the 1-row→N-rows mapInPandas shape a real video pipeline
    uses (decode container → sample keyframes → per-frame features);
    the "frame" here is a deterministic byte slice since no codec ships
    in this container, but the schema, Arrow batching, and fan-out are
    the real thing. Only (url, binary) are selected, so column pruning
    keeps the binary out of every other stage.
    """
    src = df.select("url", binary_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # frame fan-out is pure index arithmetic, so it is vectorized:
        # per-doc sampled-frame counts → np.repeat doc index → per-frame
        # offsets/lengths in one pass. Only the per-frame crc32 itself
        # (a C call over a byte slice) remains a loop — there is no
        # batched crc32 API.
        for pdf in batches:
            n_docs = len(pdf)
            payloads = pdf[binary_col].to_numpy(dtype=object)
            urls = pdf["url"].to_numpy(dtype=object)
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=n_docs
            )
            n_frames = (lens + frame_size - 1) // frame_size
            n_samp = (n_frames + every - 1) // every
            total = int(n_samp.sum())
            doc_of = np.repeat(np.arange(n_docs), n_samp)
            starts = np.zeros(n_docs, dtype=np.int64)
            if n_docs > 1:
                np.cumsum(n_samp[:-1], out=starts[1:])
            frame_idx = (np.arange(total, dtype=np.int64) - starts[doc_of]) * every
            off = frame_idx * frame_size
            frame_len = np.minimum(frame_size, lens[doc_of] - off)
            crcs = np.empty(total, dtype=np.int64)
            for t in range(total):
                o = int(off[t])
                crcs[t] = zlib.crc32(payloads[doc_of[t]][o : o + frame_size])
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls[doc_of], dtype=object),
                    "frame_idx": pd.Series(frame_idx.astype("int32")),
                    "frame_len": pd.Series(frame_len.astype("int32")),
                    "frame_crc": pd.Series(crcs),
                }
            )

    return src.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = "url string, resized binary, resized_len int"


def resize_media(
    df: DataFrame,
    binary_col: str = "html",
    target_len: int = 256,
    real_decoder: bool = False,
) -> DataFrame:
    """Resize/downsample pattern: binary → smaller binary of ~target_len
    bytes. Real image resize needs a codec (raises, like decode_batch);
    the stub stride-samples the bytes deterministically so the
    batch shape, binary-in/binary-out schema, and size contract are
    exercised end-to-end."""
    src = df.select("url", binary_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stride-sampling is pure index arithmetic, vectorized like
        # sample_frames: all payloads concatenate into one uint8 buffer,
        # one fancy-indexed gather pulls every kept byte, and the result
        # splits back into per-doc bytes. The only remaining per-doc work
        # is O(n_docs) slice/tobytes calls — no per-byte Python anywhere.
        for pdf in batches:
            if real_decoder:
                raise NotImplementedError(
                    "real media resize requires image libs not present in "
                    "this container; wire a decoder here (same batch shape)"
                )
            n_docs = len(pdf)
            payloads = pdf[binary_col].to_numpy(dtype=object)
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=n_docs
            )
            steps = np.maximum(lens // target_len, 1)
            # len(b[::step][:target_len]) == min(ceil(len/step), target_len)
            n_out = np.minimum(-(-lens // steps), target_len)
            total = int(n_out.sum())
            doc_of = np.repeat(np.arange(n_docs), n_out)
            out_starts = np.zeros(n_docs, dtype=np.int64)
            doc_starts = np.zeros(n_docs, dtype=np.int64)
            if n_docs > 1:
                np.cumsum(n_out[:-1], out=out_starts[1:])
                np.cumsum(lens[:-1], out=doc_starts[1:])
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            local = np.arange(total, dtype=np.int64) - out_starts[doc_of]
            gathered = flat[doc_starts[doc_of] + local * steps[doc_of]]
            resized = pd.Series(
                [
                    gathered[out_starts[i] : out_starts[i] + n_out[i]].tobytes()
                    for i in range(n_docs)
                ],
                dtype=object,
            )
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "resized": resized,
                    "resized_len": pd.Series(n_out.astype("int32")),
                }
            )

    return src.mapInPandas(run, schema=RESIZED_SCHEMA)


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
