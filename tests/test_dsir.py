"""DSIR importance resampling (operators/dsir.py): hand-computed model
and score via an independent hashlib/math reimplementation, plan shape,
and the selection-precision promise."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ccnet_spark_spark.operators import dsir
from ccnet_spark_spark.models import round_half_up

B = dsir.N_BUCKETS


def _buckets(text):
    words = text.split(" ")
    grams = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
    return [hashlib.sha256(g.encode()).hexdigest()[: dsir.N_HEX] for g in grams]


def test_model_hand_computed(spark):
    target = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    raw = spark.createDataFrame([(2, "a c")], ["doc_id", "text"])
    model = dsir.train_dsir(target, raw)
    # target grams: a, b, "a b" (3 events); raw: a, c, "a c"
    assert model["n_target"] == 3 and model["n_raw"] == 3
    tb, rb = _buckets("a b"), _buckets("a c")
    rows = {r.bucket: r for r in model["model"].collect()}
    assert set(rows) == set(tb) | set(rb)
    ba = _buckets("a")[0]  # shared unigram bucket
    exp = round_half_up(math.log10((tb.count(ba) + 1) / (3 + B)), 6) - round_half_up(
        math.log10((rb.count(ba) + 1) / (3 + B)), 6
    )
    assert rows[ba].delta_logp == pytest.approx(exp, abs=1e-12)
    assert model["unseen_delta"] == pytest.approx(0.0, abs=1e-12)  # equal totals


def test_score_hand_computed(spark):
    target = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    raw = spark.createDataFrame([(2, "a c")], ["doc_id", "text"])
    model = dsir.train_dsir(target, raw)
    deltas = {r.bucket: r.delta_logp for r in model["model"].collect()}
    scored = {r.doc_id: r for r in dsir.score_dsir(raw.union(target), model).collect()}
    for doc_id, text in [(1, "a b"), (2, "a c")]:
        exp = sum(round_half_up(deltas.get(b, model["unseen_delta"]), 6) for b in _buckets(text))
        assert scored[doc_id].n_grams == 3
        assert scored[doc_id].log_w == pytest.approx(exp, abs=1e-9)
    # target-style text must outscore raw-style text
    assert scored[1].log_w > scored[2].log_w


def test_score_plan_shape(spark):
    target = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    raw = spark.createDataFrame([(2, "a c")], ["doc_id", "text"])
    model = dsir.train_dsir(target, raw)
    plan = dsir.score_dsir(raw, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_selection_precision(spark):
    """The contract query's promise: the top-60 most target-like raw
    captions are >= 90% the teacher's 'en' (vs ~56% base rate)."""
    import __spark_entry__ as em

    sel = em.queries()["dsir_select"](spark, "/root/testdata/sf0.001")
    labeled = em._nb_lid_labeled(spark).select("image_id", "lang")
    m = sel.join(labeled, "image_id").collect()
    assert len(m) == 60
    prec = sum(1 for r in m if r.lang == "en") / len(m)
    assert prec >= 0.9, prec


class TestAlphaMix:
    """sample.alpha_mix_rates math + the composed sampler's direction."""

    def test_rates_shape(self):
        from ccnet_spark_spark.operators.sample import alpha_mix_rates

        counts = {"en": 800, "fr": 100, "zh": 100}
        prop = alpha_mix_rates(counts, alpha=1.0, target_frac=0.5)
        # alpha=1 is proportional: every language keeps the same rate
        assert len(set(prop.values())) == 1 and abs(prop["en"] - 128) <= 1
        temp = alpha_mix_rates(counts, alpha=0.3, target_frac=0.5)
        # temperature < 1 shifts budget from head to tail
        assert temp["en"] < prop["en"] and temp["fr"] > prop["fr"]
        # alpha=0 is uniform across languages: equal target ROWS per lang
        unif = alpha_mix_rates(counts, alpha=0.0, target_frac=0.3)
        assert unif["fr"] == unif["zh"] and unif["en"] * 8 <= unif["fr"] + 8
        assert alpha_mix_rates({}, 0.3, 0.5) == {}

    def test_sampler_direction(self, spark):
        from ccnet_spark_spark.operators.sample import alpha_mix_sample

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
            "doc_id", "lang"
        )
        before = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        kept = alpha_mix_sample(docs, alpha=0.3, target_frac=0.5)
        after = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # head language loses share, every language survives
        assert after["en"] / before["en"] < after["fr"] / before["fr"]
        assert set(after) == set(before)
        total = sum(after.values()) / sum(before.values())
        assert 0.35 < total < 0.75  # near the 50% budget (hash quantization)


class TestFuzzyDecontaminate:
    def test_exact_and_unrelated(self, spark):
        from ccnet_spark_spark.operators import dedup

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
            "doc_id", "text"
        )
        # exact copies ALWAYS band -> guaranteed dropped
        evals = docs.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 500000).alias("eval_id"), "text"
        )
        out = dedup.fuzzy_decontaminate(docs, evals, "doc_id", "text", threshold=0.4)
        kept = {r.doc_id for r in out.select("doc_id").collect()}
        assert kept.isdisjoint(set(range(10)))
        # other corpus docs may legitimately sit above 0.4 Jaccard vs the
        # copied texts (shared synthetic vocabulary) — only bound the count
        assert docs.count() - 20 <= len(kept) <= docs.count() - 10
        # an unrelated eval set drops nothing
        unrelated = spark.createDataFrame(
            [(1, "zzz qqq vvv totally unrelated"), (2, "mmm nnn ooo ppp rrr")],
            "eval_id long, text string",
        )
        out2 = dedup.fuzzy_decontaminate(docs, unrelated, "doc_id", "text", threshold=0.4)
        assert out2.count() == docs.count()

    def test_eval_side_broadcast(self, spark):
        from ccnet_spark_spark.operators import dedup

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
            "doc_id", "text"
        )
        evals = docs.limit(5).select((F.col("doc_id") + 1000).alias("eval_id"), "text")
        plan = (
            dedup.fuzzy_decontaminate(docs, evals, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "Cartesian" not in plan
