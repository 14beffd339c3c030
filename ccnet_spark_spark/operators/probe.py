"""Linear quality classifier trained in-engine (ridge / normal equations).

The modern quality-filter recipe (DataComp, DCLM, FineWeb-Edu) trains a
cheap linear classifier to MIMIC an expensive quality signal, then runs
the classifier over the whole corpus. The reference consumes its quality
signal (KenLM perplexity) directly; this module adds the train-the-
cheap-mimic step as a first-class operator: ridge regression of a
quality LABEL (here: the perplexity gate's keep bit) onto integer
surface features of the text, solved in closed form from the normal
equations.

Why this trains EXACTLY (the oracle story): every feature is an INTEGER
(char/word/line/digit/stopword counts, max word length), so X'X and X'y
are exact int64 sums — associative, partition-order-free, identical in
Spark, DuckDB and numpy. Both the engine and the oracle feed the same
int64 matrices to the same `numpy.linalg.solve`, so the weights — and
therefore every score, which is a fixed-order chain of literal-double ×
integer products — are bit-identical cross-engine. No fixture needed:
the oracle RETRAINS independently from the parquet.

Scale: training is ONE aggregation over the labeled slice producing a
d(d+3)/2-cell row (d = 7 features) collected driver-side — the classic
distributed-normal-equations shape; nothing grows with corpus size.
Scoring is a pure scan-side projection (whole-stage codegen, no joins,
no shuffle): the trained weights fold into literals exactly like the
reference folds its cutoff dict into a CASE chain.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["a", "and", "of", "the", "to"]
WLEN_BUCKETS = range(1, 13)  # word-length histogram bins (exact length 1..12)


def feature_names(langs: tuple[str, ...] = ()) -> list[str]:
    names = ["bias", "n_chars", "n_words", "n_lines", "n_digits", "max_word_len", "n_stop"]
    names += [f"n_wlen_{k}" for k in WLEN_BUCKETS]
    names += [f"is_{l}" for l in langs]
    names += [f"nw_x_{l}" for l in langs]
    return names


def feature_exprs(
    text_col: str = "text", lang_col: str = "lang", langs: tuple[str, ...] = ()
) -> list[tuple[str, Column]]:
    """The integer surface features, as built-in Spark expressions (cast to
    bigint so products in the normal equations can never overflow int32):
    counts, a word-length histogram (the stub LM's per-piece penalty is a
    function of word length, so the histogram is the honest 'surface
    feature that carries the quality signal'), plus per-language one-hots
    and language × n_words interactions — the label's threshold varies by
    language, and a linear model needs the interaction to express a
    per-language slope."""
    t = F.col(text_col)
    words = F.split(t, " ")
    feats = [
        ("bias", F.lit(1)),
        ("n_chars", F.length(t)),
        ("n_words", F.size(words)),
        ("n_lines", F.size(F.split(t, "\n"))),
        ("n_digits", F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))),
        ("max_word_len", F.array_max(F.transform(words, lambda w: F.length(w)))),
        ("n_stop", F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))),
    ]
    # NB: a two-parameter lambda would be read by Spark as (element, index)
    # — the `lambda w, k=k:` default-arg idiom silently binds k to the
    # array index. A one-arg closure from a factory is the safe spelling.
    def _wlen_eq(k):
        return lambda w: F.length(w) == k

    for k in WLEN_BUCKETS:
        feats.append((f"n_wlen_{k}", F.size(F.filter(words, _wlen_eq(k)))))
    for l in langs:
        feats.append((f"is_{l}", F.when(F.col(lang_col) == l, F.lit(1)).otherwise(F.lit(0))))
    for l in langs:
        feats.append(
            (f"nw_x_{l}", F.when(F.col(lang_col) == l, F.size(words)).otherwise(F.lit(0)))
        )
    return [(n, c.cast("bigint")) for n, c in feats]


def feature_sqls(
    text_expr: str = "text", lang_expr: str = "lang", langs: tuple[str, ...] = ()
) -> list[tuple[str, str]]:
    """DuckDB twins of feature_exprs — kept adjacent so a drift is a diff."""
    words = f"string_split({text_expr}, ' ')"
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    feats = [
        ("bias", "1"),
        ("n_chars", f"len({text_expr})"),
        ("n_words", f"len({words})"),
        ("n_lines", f"len(string_split({text_expr}, chr(10)))"),
        ("n_digits", f"len({text_expr}) - len(regexp_replace({text_expr}, '[0-9]', '', 'g'))"),
        ("max_word_len", f"list_max(list_transform({words}, w -> len(w)))"),
        ("n_stop", f"len(list_filter({words}, w -> list_contains([{stop}], w)))"),
    ]
    for k in WLEN_BUCKETS:
        feats.append((f"n_wlen_{k}", f"len(list_filter({words}, w -> len(w) = {k}))"))
    for l in langs:
        feats.append((f"is_{l}", f"case when {lang_expr} = '{l}' then 1 else 0 end"))
    for l in langs:
        feats.append((f"nw_x_{l}", f"case when {lang_expr} = '{l}' then len({words}) else 0 end"))
    return [(n, f"cast({sql} as bigint)") for n, sql in feats]


def with_features(df: DataFrame, text_col: str = "text", lang_col: str = "lang", langs: tuple[str, ...] = ()) -> DataFrame:
    out = df
    for name, col in feature_exprs(text_col, lang_col, langs):
        out = out.withColumn(name, col)
    return out


def solve_ridge(xtx: np.ndarray, xty: np.ndarray, lam: int = 1) -> list[float]:
    """The SHARED closing solve — engine and oracle both call this on their
    (identical, exact-integer) matrices."""
    d = xtx.shape[0]
    a = xtx.astype(np.float64) + float(lam) * np.eye(d)
    return [float(w) for w in np.linalg.solve(a, xty.astype(np.float64))]


def train_ridge(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = (),
    lam: int = 1,
) -> list[float]:
    """Distributed normal equations, MLlib-style: features are computed
    JVM-side in a projection (the heavy text processing never crosses to
    Python), then each partition folds its Arrow batches of small int64
    columns into ONE partial Gram matrix with a vectorized numpy matmul —
    [y|X]'[y|X] gives X'X and X'y in the same product — and the
    per-partition partials (bounded: one (d+1)² array per partition) are
    summed driver-side. Everything stays exact int64, so the result is
    identical to the oracle's independent retrain bit-for-bit.

    Why not a single d(d+3)/2-column agg: past ~100 aggregate expressions
    Spark drops out of whole-stage codegen into interpreted row-at-a-time
    aggregation (measured 6-10 s for 2.5k rows × 464 cells at d=29); the
    vectorized partial-matmul is the shape MLlib's own normal-equation
    solver uses and is ~20× faster here. `label_col` must be an int 0/1
    column already on df.

    NULL text or label rows are filtered BEFORE the projection: a NULL
    feature arrives in the Arrow batch as NaN and numpy's int64
    conversion would silently wrap it to -2^63, poisoning the Gram with
    no error. Overflow bound: per-partition accumulation is int64 —
    safe while rows-per-partition × max(feature)² stays under 2^63
    (~1e10 rows/partition at 1e4-char docs; real partitions are orders
    of magnitude smaller) — and the cross-partition sum runs in
    unbounded Python ints, so total corpus size never overflows."""
    import pandas as pd

    feats = feature_exprs(text_col, lang_col, langs)
    d = len(feats)
    clean = df.where(F.col(text_col).isNotNull() & F.col(label_col).isNotNull())
    proj = clean.select(
        F.col(label_col).cast("bigint").alias("_y"),
        *[c.alias(f"_f{i}") for i, (_n, c) in enumerate(feats)],
    )

    def gram_partial(batches):
        acc = np.zeros((d + 1, d + 1), dtype=np.int64)
        for pdf in batches:
            m = pdf.to_numpy(dtype=np.int64)
            acc += m.T @ m
        yield pd.DataFrame({"cell": [acc.reshape(-1).tolist()]})

    rows = proj.mapInPandas(gram_partial, "cell array<long>").collect()
    # cross-partition sum in PYTHON ints (unbounded) — int64 here could
    # wrap at extreme corpus sizes even when every partial is safe
    cells = [0] * ((d + 1) * (d + 1))
    for r in rows:
        for i, v in enumerate(r.cell):
            cells[i] += v
    gram = np.array(cells, dtype=np.float64).reshape(d + 1, d + 1)
    xty = gram[0, 1:]
    xtx = gram[1:, 1:]
    return solve_ridge(xtx, xty, lam)


def oracle_train_ridge(
    parquet_path: str,
    where_sql: str,
    label_sql: str,
    langs: tuple[str, ...] = (),
    lam: int = 1,
) -> list[float]:
    """INDEPENDENT retrain for the oracle side: features + label via DuckDB
    SQL, exact-int64 normal equations in numpy, same solve. Never touches
    Spark — a genuine second implementation of the trainer."""
    import duckdb

    cols = ", ".join(f"{sql} as {name}" for name, sql in feature_sqls("text", "lang", langs))
    q = (
        f"select {cols}, cast({label_sql} as bigint) as label "
        f"from read_parquet('{parquet_path}') "
        f"where ({where_sql}) and text is not null"
    )
    pdf = duckdb.sql(q).df()
    x = pdf[feature_names(langs)].to_numpy(dtype=np.int64)
    y = pdf["label"].to_numpy(dtype=np.int64)
    return solve_ridge(x.T @ x, x.T @ y, lam)


def score_expr(
    weights: list[float], text_col: str = "text", lang_col: str = "lang", langs: tuple[str, ...] = ()
) -> Column:
    """Fixed-left-assoc dot product of literal weights × integer features —
    the same operation sequence score_sql emits, so scores are
    bit-identical cross-engine."""
    feats = feature_exprs(text_col, lang_col, langs)
    terms = [F.lit(w) * col for w, (_, col) in zip(weights, feats)]
    return reduce(lambda a, b: a + b, terms)


def score_sql(
    weights: list[float], text_expr: str = "text", lang_expr: str = "lang", langs: tuple[str, ...] = ()
) -> str:
    feats = feature_sqls(text_expr, lang_expr, langs)
    return " + ".join(f"({w!r}) * ({sql})" for w, (_, sql) in zip(weights, feats))
