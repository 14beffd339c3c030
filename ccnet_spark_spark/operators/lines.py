"""Doc -> line explode (reference P2, /root/reference/pipe_line.py:199-201).

Key scale improvement over the reference: the reference keeps ALL document
columns through the explode (select("*", posexplode) then drop), multiplying
the full row width by nlines and dragging it through two shuffles
(/root/reference/profile.md:3 records >110 GB memory on hash+count). Here the
explode is a *narrow side-plan*: only (id, line_id, line) flow into dedup;
wide columns (image bytes!) never explode or shuffle — survivors join back
by id at the end (see dedup.regroup / pipeline join_back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import normalize_for_dedup_expr


def explode_lines(df: DataFrame, id_col: str = "image_id", text_col: str = "caption", sep: str = "\n") -> DataFrame:
    """(id, text) -> (id, line_id, line), one row per line."""
    return df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_id", "line"),
    )


def with_line_hash(lines: DataFrame, algo: str = "sha2") -> DataFrame:
    """Add normalize_line + hash_value (reference H1+H2,
    /root/reference/pipe_line.py:204-206 / pipe_hash.py:30-37).
    Empty-normalizing lines keep hash of '' — same as the reference."""
    from ..functions.hashing import line_hash_expr

    normalized = normalize_for_dedup_expr(F.col("line"))
    return lines.withColumn("normalize_line", normalized).withColumn(
        "hash_value", line_hash_expr(F.col("normalize_line"), algo=algo)
    )
