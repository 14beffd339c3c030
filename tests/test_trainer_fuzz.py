"""Hypothesis fuzz for the round-5 trainers: random small corpora vs
INDEPENDENT pure-Python reimplementations (collections.Counter + math),
so the DataFrame algebra is checked on shapes the fixed contract corpora
never hit (single-word docs, repeated words, unseen-everything scoring,
one-language corpora)."""

import math
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ccnet_spark_spark.models import round_half_up
from ccnet_spark_spark.operators import lm, nb_lid

WORDS = ["aa", "bb", "cc", "dd", "ee"]
LANGS = ["en", "fr"]


def _texts(min_docs=1):
    return st.lists(
        st.tuples(
            st.sampled_from(LANGS),
            st.lists(st.sampled_from(WORDS), min_size=1, max_size=6).map(" ".join),
        ),
        min_size=min_docs,
        max_size=8,
    )


class PyBigramLM:
    """Independent reference: Counter-based add-1 bigram LM."""

    def __init__(self, docs):
        self.bi = Counter()
        self.ctx = Counter()
        self.vocab = {}
        for lang, text in docs:
            toks = ["<s>"] + text.split(" ") + ["</s>"]
            for a, b in zip(toks, toks[1:]):
                self.bi[(lang, a, b)] += 1
                self.ctx[(lang, a)] += 1
                self.vocab.setdefault(lang, set()).add(b)

    def logp(self, lang, a, b):
        v = len(self.vocab[lang])
        return round_half_up(
            math.log10((self.bi.get((lang, a, b), 0) + 1) / (self.ctx.get((lang, a), 0) + v)), 6
        )

    def pp(self, lang, text):
        toks = ["<s>"] + text.split(" ") + ["</s>"]
        lps = [self.logp(lang, a, b) for a, b in zip(toks, toks[1:])]
        # decimal-exact sum: work in micro-units like the engines
        total = sum(round(x * 1e6) for x in lps)
        n = len(lps)
        return round_half_up(10.0 ** (-(total / 1e6) / n), 4), n


class TestLMFuzz:
    @given(_texts(min_docs=2), _texts(min_docs=1))
    @settings(max_examples=12, deadline=None)
    def test_train_and_score_match_python(self, spark, train_docs, score_docs):
        ref = PyBigramLM(train_docs)
        tdf = spark.createDataFrame(
            [(i, t, l) for i, (l, t) in enumerate(train_docs)], ["doc_id", "text", "lang"]
        )
        model = lm.train_bigram_lm(tdf)
        for r in model["bigrams"].collect():
            assert r.c12 == ref.bi[(r.lang, r.w1, r.w2)]
            assert r.logp == pytest.approx(ref.logp(r.lang, r.w1, r.w2), abs=1e-12)
        sdf = spark.createDataFrame(
            [(i, t, l) for i, (l, t) in enumerate(score_docs)], ["doc_id", "text", "lang"]
        )
        got = {r.doc_id: r for r in lm.score_bigram_pp(sdf, model).collect()}
        for i, (lang, text) in enumerate(score_docs):
            if lang not in ref.vocab:
                assert got[i].lm_pp is None
                continue
            exp_pp, exp_n = ref.pp(lang, text)
            assert got[i].n_grams == exp_n
            assert got[i].lm_pp == pytest.approx(exp_pp, abs=1e-9)


class PyNB:
    """Independent reference: Counter-based add-1 char-trigram NB."""

    def __init__(self, docs, n=3):
        self.n = n
        self.cnt = Counter()
        self.tot = Counter()
        self.docs = Counter()
        grams = set()
        for lang, text in docs:
            self.docs[lang] += 1
            for i in range(len(text) - n + 1):
                g = text[i : i + n]
                self.cnt[(lang, g)] += 1
                self.tot[lang] += 1
                grams.add(g)
        self.v = len(grams)
        self.n_total = sum(self.docs.values())

    def score(self, lang, text):
        unseen = round_half_up(math.log10(1 / (self.tot[lang] + self.v)), 6)
        prior = round_half_up(math.log10(self.docs[lang] / self.n_total), 6)
        total = round(prior * 1e6)
        for i in range(len(text) - self.n + 1):
            g = text[i : i + self.n]
            c = self.cnt.get((lang, g))
            lp = (
                round_half_up(math.log10((c + 1) / (self.tot[lang] + self.v)), 6)
                if c
                else unseen
            )
            total += round(lp * 1e6)
        return total / 1e6

    def trained_langs(self):
        # mirrors the engine: a language with zero gram events (every doc
        # shorter than the trigram window) has no likelihood model and is
        # excluded from the candidate set
        return sorted(l for l in self.docs if self.tot[l] > 0)

    def predict(self, text):
        best = min(
            ((-self.score(lang, text), lang) for lang in self.trained_langs()),
        )
        return best[1], -best[0]


class TestNBLidFuzz:
    @given(_texts(min_docs=2), _texts(min_docs=1))
    @settings(max_examples=10, deadline=None)
    def test_predict_matches_python(self, spark, train_docs, score_docs):
        ref = PyNB(train_docs)
        if not ref.trained_langs():
            return  # no language has a single trigram — nothing to model
        tdf = spark.createDataFrame(
            [(i, t, l) for i, (l, t) in enumerate(train_docs)], ["doc_id", "text", "lang"]
        )
        model = nb_lid.train_nb_lid(tdf)
        assert model["v"] == ref.v and model["n_total"] == ref.n_total
        sdf = spark.createDataFrame(
            [(i, t) for i, (_l, t) in enumerate(score_docs)], ["doc_id", "text"]
        )
        langs = ref.trained_langs()
        got = {r.doc_id: r for r in nb_lid.predict_nb_lid(sdf, model, langs).collect()}
        for i, (_lang, text) in enumerate(score_docs):
            exp_lang, exp_score = ref.predict(text)
            assert got[i].pred_lang == exp_lang
            assert got[i].nb_score == pytest.approx(exp_score, abs=1e-9)
