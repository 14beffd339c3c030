"""As-of (backward, inclusive) join — a custom operator Spark's DataFrame
API lacks, expressed as a composition of existing operators instead of a
UDF or a range cross-join:

    union(left, right) -> one shuffle by key -> per-key time sort ->
    last(value, ignorenulls) carry-forward -> keep left rows.

For each left row this attaches the most recent right-side values with
right.ts <= left.ts for the same key. Cost is ONE hash shuffle + sort of
|left|+|right| rows — no join explosion, no per-row Python, skew handled by
the same AQE machinery as any other shuffle. The DuckDB oracle twin uses
its NATIVE `ASOF LEFT JOIN`, so the composition is cross-validated against
an independent implementation of the semantics (both are inclusive at
equal timestamps; at equal right timestamps the carried row is the last in
(ts, tiebreak) order, so pre-aggregate the right side to unique (key, ts)
for fully deterministic results).
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
    r_tag = right.select(on, ts_col, *value_cols).withColumn("_side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows (_side=0) sort BEFORE left rows at equal ts -> inclusive
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for v in value_cols:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return u.where(F.col("_side") == 1).drop("_side")
