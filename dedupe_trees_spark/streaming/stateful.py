"""Custom stateful streaming operator: per-source duplicate-rate stats
via ``applyInPandasWithState`` (the arbitrary-state API — what you reach
for when watermarked dedup/window built-ins can't express the
semantics).

For every ``source`` (a crawl feed), the operator maintains a bounded
set of recently-seen content hashes plus running totals, and emits one
update row per source per micro-batch:

    (source, batch_docs, batch_dups, total_docs, total_dups)

This is the ingest-monitoring twin of the batch dup-set histogram: a
feed that suddenly replays old WARCs shows up as a dup-rate spike
within one trigger, long before the nightly batch job re-clusters.

State discipline (the part that matters at web scale):
- the seen-hash set is CAPPED at ``max_hashes`` per source (oldest
  dropped first) — state per key is O(1), not O(stream length); beyond
  the cap the dup count is a lower bound, which is the right trade for
  a monitoring signal;
- idle sources expire via processing-time timeout (``state_ttl``), so
  dead feeds don't hold state forever.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dedupe_trees_spark.functions.text import content_hash, normalize_text
from dedupe_trees_spark.streaming.dedup_stream import PAGES_SCHEMA

OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("batch_docs", LongType()),
        StructField("batch_dups", LongType()),
        StructField("total_docs", LongType()),
        StructField("total_dups", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("total_docs", LongType()),
        StructField("total_dups", LongType()),
        StructField("seen", ArrayType(LongType())),
    ]
)


def _update_source(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    max_hashes: int,
    ttl_ms: int,
) -> Iterator[pd.DataFrame]:
    (source,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        total_docs, total_dups, seen_list = state.get
        seen = list(seen_list)
    else:
        total_docs, total_dups, seen = 0, 0, []
    seen_set = set(seen)
    batch_docs = batch_dups = 0
    for pdf in pdfs:
        # vectorized dup check: dup = already in state OR a repeat of an
        # earlier row in this same frame (pandas C paths, no per-row
        # Python — same rule the old scalar loop applied in order)
        h = pdf["content_hash"].astype("int64")
        batch_docs += len(h)
        in_state = h.isin(seen_set)
        first_here = ~h.duplicated(keep="first")
        batch_dups += int((in_state | ~first_here).sum())
        new = h[~in_state & first_here].tolist()
        seen_set.update(new)
        seen.extend(new)
    if len(seen) > max_hashes:                      # bounded state: drop oldest
        seen = seen[len(seen) - max_hashes :]
    total_docs += batch_docs
    total_dups += batch_dups
    state.update((total_docs, total_dups, seen))
    if ttl_ms > 0:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame(
        {
            "source": [source],
            "batch_docs": [batch_docs],
            "batch_dups": [batch_dups],
            "total_docs": [total_docs],
            "total_dups": [total_dups],
        }
    )


def source_dup_rate_stream(
    spark: SparkSession,
    input_dir: str,
    max_hashes: int = 100_000,
    state_ttl: str | None = "1 hour",
    schema: str = PAGES_SCHEMA,
) -> DataFrame:
    """Streaming DataFrame of per-source dup-rate updates (one row per
    source per micro-batch).

    ``state_ttl=None`` disables the idle-source processing-time timeout
    (NoTimeout) — use in tests/availableNow runs, where timeout wake-ups
    would keep scheduling micro-batches.

    ``state_ttl`` accepts ``"<n> <unit>"`` with unit in
    {ms/millisecond(s), second(s), minute(s), hour(s), day(s), week(s)}
    — the same surface Spark's own ``CalendarInterval`` strings cover for
    sub-month spans (months/years are deliberately excluded: variable
    length, and a processing-time TTL over weeks already exceeds any
    realistic streaming state horizon). Anything else raises ValueError.
    """
    ttl_ms = _duration_ms(state_ttl) if state_ttl else 0
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    hashed = stream.select(
        "source", content_hash(normalize_text("text")).alias("content_hash")
    )

    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Any:
        return _update_source(key, pdfs, state, max_hashes, ttl_ms)

    return hashed.groupBy("source").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms > 0
            else GroupStateTimeout.NoTimeout
        ),
    )


_DURATION_FACTORS = {
    "millisecond": 1, "milliseconds": 1, "ms": 1,
    "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
    "week": 604_800_000, "weeks": 604_800_000,
}


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    if unit not in _DURATION_FACTORS:
        raise ValueError(
            f"unsupported duration unit {unit!r} in {s!r}; supported: "
            + ", ".join(sorted(set(_DURATION_FACTORS)))
        )
    return int(n) * _DURATION_FACTORS[unit]
