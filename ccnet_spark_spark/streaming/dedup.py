"""Stateful streaming deduplication (engine addition — the reference is
batch-only; a production quality filter also ingests pairs continuously).

Custom stateful operator via applyInPandasWithState: group by the
normalized caption hash; keyed state remembers whether the hash was seen
in ANY earlier micro-batch; only first occurrences are emitted. State
lives in the streaming checkpoint, so dedup survives restarts — the
streaming twin of batch exact_dedup.

(Spark's built-in dropDuplicates on streams needs a watermark to bound
state and keeps whole rows; keyed boolean state is smaller and gives an
explicit eviction hook.) At 10^12 scale unbounded state is the one thing
that kills this job: ``ttl_ms`` arms ProcessingTimeTimeout eviction —
each key's state expires ttl_ms after its LAST sighting (every duplicate
refreshes the clock), trading exactness for bounded state the same way
production dedup caches do.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.hashing import line_hash_expr
from ..functions.normalize import normalize_for_dedup_expr

OUTPUT_SCHEMA = "image_id string, caption string, hash_value string"
STATE_SCHEMA = "seen boolean"


def _make_dedup_fn(ttl_ms: int | None):
    def dedup_fn(key: Any, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # evicted: the hash may be emitted again later
            return
        seen = state.exists
        out = []
        for pdf in batches:
            if seen or pdf.empty:
                continue
            out.append(pdf.head(1))  # first occurrence wins
            seen = True
        if out:
            state.update((True,))
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            yield pd.concat(out)
        elif state.exists and ttl_ms:
            state.setTimeoutDuration(ttl_ms)  # duplicate sighting refreshes TTL

    return dedup_fn


def streaming_exact_dedup(
    stream: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    ttl_ms: int | None = None,
) -> DataFrame:
    """ttl_ms=None: exact forever-dedup (state grows with distinct hashes).
    ttl_ms=N: state for a hash is dropped N ms of processing time after its
    last sighting — bounded state, approximate beyond the TTL horizon.

    Operational caveat (measured): with ProcessingTimeTimeout armed, Spark
    runs a micro-batch EVERY trigger tick to check timeout clocks, so the
    query never quiesces — use a processingTime trigger and monitor the
    sink; Trigger.AvailableNow / processAllAvailable() will never return."""
    hashed = stream.select(
        F.col(id_col).alias("image_id"),
        F.col(text_col).alias("caption"),
        line_hash_expr(normalize_for_dedup_expr(F.col(text_col))).alias("hash_value"),
    )
    timeout = GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    return hashed.groupBy("hash_value").applyInPandasWithState(
        _make_dedup_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_native_dedup(
    stream: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    event_time_col: str | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """The BUILT-IN route to the same semantics: Spark 3.5+'s
    dropDuplicatesWithinWatermark keyed on the normalized caption hash —
    state eviction driven by the EVENT-time watermark instead of our
    custom operator's processing-time TTL (the two columns of the standard
    streaming-dedup design space; cross-validated against each other by
    the contract queries sharing one oracle).

    Rows deduplicate across micro-batches as long as their event times fall
    within `delay` of the watermark; with event_time_col=None a constant
    event time is stamped, the watermark never advances past it, and state
    never evicts — exact forever-dedup, the native twin of
    streaming_exact_dedup(ttl_ms=None). At 10^12 scale you pass the real
    ingest timestamp instead, and `delay` IS the bounded-state knob."""
    ts = (
        F.col(event_time_col)
        if event_time_col
        else F.lit("2026-01-01 00:00:00").cast("timestamp")
    )
    hashed = stream.select(
        F.col(id_col).alias("image_id"),
        F.col(text_col).alias("caption"),
        line_hash_expr(normalize_for_dedup_expr(F.col(text_col))).alias("hash_value"),
        ts.alias("_event_ts"),
    )
    return (
        hashed.withWatermark("_event_ts", delay)
        .dropDuplicatesWithinWatermark(["hash_value"])
        .drop("_event_ts")
    )
