"""Fuzz-pins for the r6 stub-model fast paths: the batched/packed
implementations the Arrow UDFs run must be bit-identical to the per-row
reference spec functions (stub_predict_lang_one / stub_perplexity_one).

These exist because the optimization round changed the stub INTERNALS
(packed-mask LID accumulation, closed-form vectorized perplexity) without
being allowed to change what any query computes."""

from __future__ import annotations

import random

import pandas as pd

from ccnet_spark_spark import models


def _fuzz_texts(n: int, seed: int) -> list:
    rng = random.Random(seed)
    allwords = [w for ws in models.VOCAB.values() for w in ws] + [
        "xyz", "qqq", "123", "", "the.", "LE", "山河x",
    ]
    out = []
    for _ in range(n):
        k = rng.randint(0, 40)
        t = " ".join(rng.choice(allwords) for _ in range(k))
        t += rng.choice(["", "\nthe le der el 山河", "\t ", "\n\n"])
        out.append(t)
    out += [None, "", "\n", " ", "the", "the the", "le the", "der le el the 山河"]
    return out


def test_stub_predict_lang_matches_per_row_spec():
    texts = _fuzz_texts(3000, seed=17)
    batch = models.stub_predict_lang(pd.Series(texts, dtype="object"))
    for i, t in enumerate(texts):
        lang, score = models.stub_predict_lang_one(t)
        blang = batch["lang"].iloc[i]
        bscore = batch["score"].iloc[i]
        bscore = None if pd.isna(bscore) else float(bscore)
        assert lang == blang, (t, lang, blang)
        assert score == bscore, (t, score, bscore)


def test_stub_predict_lang_threshold_passthrough():
    texts = ["the quick fox", "xyz xyz xyz xyz"]
    batch = models.stub_predict_lang(pd.Series(texts, dtype="object"), threshold=0.9)
    for i, t in enumerate(texts):
        lang, score = models.stub_predict_lang_one(t, threshold=0.9)
        assert batch["lang"].iloc[i] == lang
        b = batch["score"].iloc[i]
        assert (score is None and pd.isna(b)) or score == float(b)


def test_stub_perplexity_batch_matches_per_row_spec():
    rng = random.Random(23)
    alphabet = "abcdefghijklmnopqrstuvwxyzéàü中文 0189"
    raw = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 300)))
        for _ in range(3000)
    ] + ["", "a", "ab abc abcd abcdefgh"]
    toks = [models.stub_tokenize_one(t) for t in raw]
    batch = models.stub_perplexity_batch(pd.Series(toks, dtype="object"))
    for t, got in zip(toks, batch):
        assert models.stub_perplexity_one(t) == got, repr(t)


def test_stub_perplexity_series_null_semantics():
    toks = pd.Series([models.stub_tokenize_one("hello world"), None, ""], dtype="object")
    langs = pd.Series(["en", "en", "xx"], dtype="object")
    out = models.stub_perplexity(toks, langs)
    assert out.iloc[0] == models.stub_perplexity_one(toks.iloc[0])
    assert pd.isna(out.iloc[1])  # null tokenized -> null
    assert pd.isna(out.iloc[2])  # unknown lang -> null
