"""Stateful streaming deduplication (engine addition — the reference is
batch-only; a production quality filter also ingests pairs continuously).

Custom stateful operator via applyInPandasWithState: group by the
normalized caption hash; keyed state remembers whether the hash was seen
in ANY earlier micro-batch; only first occurrences are emitted. State
lives in the streaming checkpoint, so dedup survives restarts — the
streaming twin of batch exact_dedup.

(Spark's built-in dropDuplicates on streams needs a watermark to bound
state and keeps whole rows; keyed boolean state is smaller and gives an
explicit eviction hook — at 10^12 scale you would also set a state TTL
via GroupStateTimeout.)
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


def _dedup_fn(key: Any, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    seen = state.exists
    out = []
    for pdf in batches:
        if seen or pdf.empty:
            continue
        out.append(pdf.head(1))  # first occurrence wins
        seen = True
    if out:
        state.update((True,))
        yield pd.concat(out)


def streaming_exact_dedup(stream: DataFrame, id_col: str = "image_id", text_col: str = "caption") -> DataFrame:
    hashed = stream.select(
        F.col(id_col).alias("image_id"),
        F.col(text_col).alias("caption"),
        line_hash_expr(normalize_for_dedup_expr(F.col(text_col))).alias("hash_value"),
    )
    return hashed.groupBy("hash_value").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
