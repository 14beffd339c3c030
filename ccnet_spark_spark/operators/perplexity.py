"""KenLM-style document perplexity (reference M3,
/root/reference/pipe_perplexity.py:21-36): per line, score = Σ log10
p(piece), length = len(split)+1; doc pp = round(10^(-Σscore/Σlength), 1).

Vectorized pandas UDF; real KenLM binary models (mmap-loaded once per
worker, the reference's load_method=2 lesson at pipe_perplexity.py:8-18)
when available, deterministic stub otherwise. The stub's piece logscore is
length-only arithmetic, so the exact same math is reproducible in DuckDB —
the oracle gate checks the full formula end-to-end.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import models


def _real_kenlm(lang: str, lm_dir: str):
    key = ("kenlm", lang, lm_dir)
    if key not in models._MODEL_CACHE:
        try:
            import kenlm  # noqa: F401 (not in sandbox image)

            cfg = kenlm.Config()
            cfg.load_method = 2  # lazy mmap — page-cache friendly
            models._MODEL_CACHE[key] = kenlm.Model(os.path.join(lm_dir, f"{lang}.arpa.bin"), cfg)
        except Exception:
            models._MODEL_CACHE[key] = None
    return models._MODEL_CACHE[key]


def make_perplexity_udf(lm_dir: str | None = None):
    @F.pandas_udf(T.FloatType())
    def pp_udf(tokenized: pd.Series, langs: pd.Series) -> pd.Series:
        if lm_dir and os.path.isdir(lm_dir):
            out = []
            for tok, lang in zip(tokenized, langs):
                model = _real_kenlm(lang, lm_dir) if lang else None
                if tok is None:
                    out.append(None)
                elif model is None:
                    out.append(models.stub_perplexity_one(tok) if lang in models.VOCAB else None)
                else:
                    score, length = 0.0, 0
                    for line in tok.split("\n"):
                        score += model.score(line)
                        length += len(line.split()) + 1
                    out.append(round(10.0 ** (-score / length), 1) if length else 0.0)
            return pd.Series(out, dtype="float64").astype("float32")
        return models.stub_perplexity(tokenized, langs).astype("float32")

    return pp_udf


def with_perplexity(df: DataFrame, tokenized_col: str = "tokenized", lm_dir: str | None = None) -> DataFrame:
    pp = make_perplexity_udf(lm_dir)
    return df.withColumn("perplexity", pp(F.col(tokenized_col), F.col("lang")))
