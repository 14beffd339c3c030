"""As-of (backward, inclusive) join — a custom operator Spark's DataFrame
API lacks, expressed as a composition of existing operators instead of a
UDF or a range cross-join:

    union(left, right) -> one shuffle by key -> per-key time sort ->
    last(struct(values), ignorenulls) carry-forward -> keep left rows.

For each left row this attaches the most recent right-side values with
right.ts <= left.ts for the same key. Cost is ONE hash shuffle + sort of
|left|+|right| rows — no join explosion, no per-row Python, skew handled by
the same AQE machinery as any other shuffle. The DuckDB oracle twin uses
its NATIVE `ASOF LEFT JOIN`, so the composition is cross-validated against
an independent implementation of the semantics (both are inclusive at
equal timestamps; at equal right timestamps the carried row is the last in
(ts, tiebreak) order, so pre-aggregate the right side to unique (key, ts)
for fully deterministic results).

All value columns are carried inside ONE struct, not per-column: a
per-column last(ignorenulls) would skip a legitimate NULL in a matched
right row and carry an OLDER row's value instead — and with several
value_cols a single left row could end up with values mixed from different
right rows. The struct itself is never null for right rows, so
last(ignorenulls) picks exactly one matched right row and preserves any
NULLs inside it — the same row-level semantics as a native as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward inclusive as-of join: left rows gain the latest value_cols
    from right where right.ts <= left.ts, matched on `on`. Rows with no
    earlier right match keep nulls (left-outer semantics). Column names in
    value_cols must not collide with left's columns."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, ts_col)]
    collide = set(value_cols) & set(left.columns)
    if collide:
        raise ValueError(f"value_cols collide with left columns: {sorted(collide)}")
    l_tag = left.withColumn("_side", F.lit(1))
    # one struct per right row: non-null even when every value inside is null,
    # so the carry-forward matches whole rows, never mixes columns across rows
    r_tag = right.select(
        on, ts_col, F.struct(*[F.col(v) for v in value_cols]).alias("_rv")
    ).withColumn("_side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows (_side=0) sort BEFORE left rows at equal ts -> inclusive
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1)
    for v in value_cols:
        out = out.withColumn(v, F.col(f"_rv.{v}"))
    return out.drop("_side", "_rv")
