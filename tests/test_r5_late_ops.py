"""Round-5 late additions: payload quarantine, self-calibrating alignment
filter, cluster-balanced diverse sampling.

The contract queries are value-checked against DuckDB by the oracle
harness; these tests pin the operator-level semantics (reason ladder,
quota bound, percentile keep rule) and the plan shapes.
"""

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccnet_spark_spark.operators.multimodal import classify_payload, validate_payloads
from ccnet_spark_spark.schema import PAIRS_SCHEMA
from ccnet_spark_spark.synth import QUARANTINE_KINDS, gen_pandas, gen_quarantine_pairs


# --------------------------------------------------------- quarantine unit
def test_classify_payload_reason_ladder():
    r = gen_pandas(0, 1).iloc[0]
    data = bytes(r.bytes)
    assert classify_payload(data, r.fmt, r.w, r.h) == "ok"
    assert classify_payload(data[:6], r.fmt, r.w, r.h) == "bad_header"
    assert classify_payload(b"XX" + data[2:], r.fmt, r.w, r.h) == "bad_magic"
    assert classify_payload(data[:-1], r.fmt, r.w, r.h) == "bad_raster"
    assert classify_payload(data + b"x", r.fmt, r.w, r.h) == "bad_raster"
    assert classify_payload(data, r.fmt, r.w + 1, r.h) == "dims_mismatch"
    assert classify_payload(data, r.fmt, r.w, r.h - 1) == "dims_mismatch"
    assert classify_payload(data, "png", r.w, r.h) == "unsupported_fmt"
    assert classify_payload(data, None, r.w, r.h) == "unsupported_fmt"
    # ladder ORDER: a wrong-magic payload with lying dims reports the
    # magic first (shared spec with the independent fixture validator)
    assert classify_payload(b"XX" + data[2:], r.fmt, r.w + 1, r.h) == "bad_magic"
    # header with a non-integer field is bad_header, not a crash
    assert classify_payload(b"P6 ab 8 255\n" + b"\0" * 192, "ppm", 8, 8) == "bad_header"
    # empty payload
    assert classify_payload(b"", r.fmt, r.w, r.h) == "bad_header"


def test_validate_payloads_never_raises_and_matches_kinds(spark):
    plants = spark.createDataFrame(gen_quarantine_pairs(4), schema=PAIRS_SCHEMA)
    out = validate_payloads(plants).toPandas().set_index("image_id")
    for kind in QUARANTINE_KINDS:
        for i in range(4):
            row = out.loc[f"img_{kind}_{i:03d}"]
            expect = "ok" if kind.startswith("ok_") else kind
            assert row.reason == expect, (kind, i, row.reason)
            assert bool(row.ok) == (expect == "ok")


def test_validate_payloads_plan_no_shuffle(spark):
    plants = spark.createDataFrame(gen_quarantine_pairs(2), schema=PAIRS_SCHEMA)
    plan = validate_payloads(plants)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_quarantine_fixture_fresh():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    disk = pd.read_parquet(os.path.join(repo, "fixtures", "payload_quarantine_expected.parquet"))
    assert len(disk) == 256, "stale fixture — rerun tools/make_fixtures.py"
    assert int((~disk.ok).sum()) == 32
    # engine classifier agrees with the independent validator row-for-row
    src = pd.concat([gen_pandas(0, 200), gen_quarantine_pairs(8)], ignore_index=True)
    got = [
        classify_payload(bytes(r.bytes), r.fmt, int(r.w), int(r.h)) for r in src.itertuples()
    ]
    assert got == disk.reason.tolist()


# ------------------------------------------------------- diverse sampling
def test_diverse_sample_quota_and_determinism(spark):
    from ccnet_spark_spark.operators import sample, similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planes = similarity.hyperplanes(64, 6, seed=7)
    b = similarity.with_lsh_bucket(emb, "embedding", planes)
    out = sample.group_quota(b, "lsh_bucket", quota=8, id_col="vec_id")
    pdf = out.toPandas()
    assert pdf.groupby("lsh_bucket").size().max() <= 8
    # groups at/below quota are kept whole
    sizes = b.groupBy("lsh_bucket").count().toPandas().set_index("lsh_bucket")["count"]
    kept = pdf.groupby("lsh_bucket").size()
    for bucket, n in sizes.items():
        assert kept.get(bucket, 0) == min(int(n), 8)
    # partition-layout invariance: same kept id set from a reshuffled input
    pdf2 = sample.group_quota(
        b.repartition(13, "vec_id"), "lsh_bucket", quota=8, id_col="vec_id"
    ).toPandas()
    assert sorted(pdf2.vec_id) == sorted(pdf.vec_id)


# ------------------------------------------------- alignment self-calibration
def test_alignment_selfcal_keep_rule(spark):
    import __spark_entry__ as entry

    kept = entry.q_alignment_selfcal(spark, "/root/testdata/sf0.001").toPandas()
    assert len(kept) > 0
    # every kept row clears its own language's cutoff
    assert (kept.alignment >= kept.cutoff).all()
    # one cutoff per language group (null lang is its own group)
    per_lang = kept.groupby(kept.lang.fillna("__null__")).cutoff.nunique()
    assert (per_lang == 1).all()
    # self-calibration keeps roughly the top 30% of each language — never
    # more than 40% of the group, never empty for groups of >= 4 rows
    from ccnet_spark_spark.operators import lid as lid_op
    from ccnet_spark_spark.operators.multimodal import caption_image_alignment
    from ccnet_spark_spark.synth import generate_pairs

    pairs = generate_pairs(spark, 200)
    al = caption_image_alignment(pairs, tau=0.1).where(F.col("alignment").isNotNull())
    langs = lid_op.with_lang(pairs.select("image_id", "caption"), "caption").select(
        "image_id", "lang"
    )
    scored = al.join(langs, "image_id").toPandas()
    group_sizes = scored.groupby(scored.lang.fillna("__null__")).size()
    kept_sizes = kept.groupby(kept.lang.fillna("__null__")).size()
    for lang, n in group_sizes.items():
        k = int(kept_sizes.get(lang, 0))
        assert k <= max(1, int(0.4 * n) + 1), (lang, k, n)
        if n >= 4:
            assert k >= 1, (lang, n)


# ------------------------------------------------- pipeline quarantine stage
def test_quarantine_passthrough_filters_and_survives_nulls(spark):
    from pyspark.sql import Row

    from ccnet_spark_spark.operators.multimodal import quarantine_passthrough

    plants = spark.createDataFrame(gen_quarantine_pairs(4), schema=PAIRS_SCHEMA)
    nulls = spark.createDataFrame(
        [
            Row(image_id="null_bytes", bytes=None, w=8, h=8, fmt="ppm", caption="c", phash=0),
            Row(
                image_id="null_dims",
                bytes=bytearray(gen_pandas(0, 1).iloc[0].bytes),
                w=None,
                h=None,
                fmt=gen_pandas(0, 1).iloc[0].fmt,
                caption="c",
                phash=0,
            ),
        ],
        schema=PAIRS_SCHEMA,
    )
    out = quarantine_passthrough(plants.unionByName(nulls)).toPandas()
    # only the spec-valid variants survive (untouched copies + the
    # comment/multi-whitespace non-canonical headers); NULL payload/dims drop
    expect = sorted(
        f"img_{kind}_{i:03d}"
        for kind in ("ok_copy", "ok_comment", "ok_multispace")
        for i in range(4)
    )
    assert sorted(out.image_id) == expect
    # schema is unchanged (full-row passthrough)
    assert list(out.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def test_pipeline_quarantine_gates_the_scrub(spark):
    """The motivation pin: payload_scrub PARSES headers and must fail on a
    corrupt corpus; quarantine=True in front makes the same corpus run
    clean and drop exactly the corrupt plants."""
    from ccnet_spark_spark.plans.pipeline import Config, Pipeline
    from ccnet_spark_spark.synth import generate_pairs

    corrupt = spark.createDataFrame(gen_quarantine_pairs(3), schema=PAIRS_SCHEMA)
    corpus = generate_pairs(spark, 40).unionByName(corrupt)

    with pytest.raises(Exception):
        Pipeline(spark, Config(payload_scrub=True)).run(corpus).count()

    out = Pipeline(spark, Config(quarantine=True, payload_scrub=True)).run(corpus)
    ids = [r.image_id for r in out.select("image_id").collect()]
    assert not any(
        i.startswith(("img_bad_", "img_dims_")) for i in ids
    ), "corrupt plants must be quarantined before the scrub"
    assert any(i.startswith("img_ok_copy_") for i in ids), "control copies must survive"


# ------------------------------------------------- semantic decontamination
def test_semantic_decontaminate_catches_exact_leaks(spark):
    from ccnet_spark_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    evals = emb.where(F.col("vec_id") < 10).select("embedding")
    out = similarity.semantic_decontaminate(
        emb, evals, threshold=0.3, n_planes=4, dim=64, seed=11
    )
    ids = {r.vec_id for r in out.select("vec_id").collect()}
    # exact leaks (cosine 1.0, always bucket-colocated) must ALL drop
    assert not (ids & set(range(10)))
    # and decontamination must not wipe the corpus
    assert len(ids) > 400
    # eval side broadcasts; corpus is never cross-joined
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------- empty inputs
def test_late_ops_empty_inputs(spark):
    """Empty-input behavior of the session's operators: empty frames in,
    empty (not crashed) frames out; empty eval set decontaminates nothing."""
    from ccnet_spark_spark.operators import sample, similarity
    from ccnet_spark_spark.operators.multimodal import (
        quarantine_passthrough,
        validate_payloads,
    )

    empty_pairs = spark.createDataFrame([], schema=PAIRS_SCHEMA)
    assert validate_payloads(empty_pairs).count() == 0
    assert quarantine_passthrough(empty_pairs).count() == 0

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    empty_emb = emb.limit(0)
    # empty corpus -> empty selection
    planes = similarity.hyperplanes(64, 6, seed=7)
    b = similarity.with_lsh_bucket(empty_emb, "embedding", planes)
    assert sample.group_quota(b, "lsh_bucket", quota=8, id_col="vec_id").count() == 0
    # empty EVAL set -> nothing flagged, whole corpus survives
    n = emb.count()
    out = similarity.semantic_decontaminate(
        emb, empty_emb.select("embedding"), threshold=0.3, n_planes=4, dim=64, seed=11
    )
    assert out.count() == n


def test_quarantine_passthrough_works_on_streams(spark, tmp_path):
    """Stage-0 quarantine at STREAMING ingest: mapInPandas composes with
    readStream, so the same operator gates a continuous ingestion job —
    corrupt payloads drop in-flight, valid rows reach the sink."""
    src = str(tmp_path / "qstream_src")
    sink = str(tmp_path / "qstream_sink")
    ckpt = str(tmp_path / "qstream_ckpt")
    from ccnet_spark_spark.operators.multimodal import quarantine_passthrough

    plants = spark.createDataFrame(gen_quarantine_pairs(4), schema=PAIRS_SCHEMA)
    plants.write.parquet(src)
    stream = spark.readStream.schema(PAIRS_SCHEMA).parquet(src)
    q = (
        quarantine_passthrough(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ids = sorted(r.image_id for r in spark.read.parquet(sink).select("image_id").collect())
    expect = sorted(
        f"img_{kind}_{i:03d}"
        for kind in ("ok_copy", "ok_comment", "ok_multispace")
        for i in range(4)
    )
    assert ids == expect


# ------------------------------------------------------- epoch shuffling
def test_epoch_shuffle_permutation_properties(spark):
    from ccnet_spark_spark.operators import sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    n = docs.count()
    e0 = sample.epoch_shuffle(docs, epoch=0).toPandas()
    e1 = sample.epoch_shuffle(docs, epoch=1).toPandas()
    for e in (e0, e1):
        # complete permutation: every row present, positions contiguous per shard
        assert len(e) == n and e.doc_id.nunique() == n
        for _, grp in e.groupby("shard"):
            assert sorted(grp.pos) == list(range(1, len(grp) + 1))
    # epochs decorrelate: the global (shard, pos) order genuinely differs
    o0 = e0.sort_values(["shard", "pos"]).doc_id.tolist()
    o1 = e1.sort_values(["shard", "pos"]).doc_id.tolist()
    assert o0 != o1
    same = sum(a == b for a, b in zip(o0, o1))
    assert same < n * 0.05, f"{same}/{n} fixed points — epochs not decorrelated"
    # retry/layout invariance: same epoch, reshuffled input, identical order
    e0b = sample.epoch_shuffle(docs.repartition(13), epoch=0).toPandas()
    assert (
        e0b.sort_values(["shard", "pos"]).doc_id.tolist() == o0
    ), "order must be content-defined, not partition-defined"


# ------------------------------------------------- token-budget selection
def test_token_budget_select_matches_straight_greedy(spark):
    import hashlib

    from ccnet_spark_spark.functions import textstats
    from ccnet_spark_spark.operators import sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id",
        textstats.quality_score_expr("text").alias("score"),
        textstats.token_count_expr("text").alias("n_tokens"),
    )
    pdf = docs.toPandas()
    pdf["h"] = [hashlib.sha256(str(i).encode()).hexdigest() for i in pdf.doc_id]
    ordered = pdf.sort_values(["score", "h", "doc_id"], ascending=[False, True, True])

    def greedy(budget):
        out, spent = [], 0
        for r in ordered.itertuples():
            if spent + r.n_tokens <= budget:
                spent += r.n_tokens
                out.append(r.doc_id)
        # greedy PREFIX: stop at the first row that does not fit
            else:
                break
        return sorted(out)

    total = int(pdf.n_tokens.sum())
    for budget in (0, 37, 5_000, 12_000, total, total + 10):
        got = sorted(
            r.doc_id
            for r in sample.token_budget_select(
                docs, budget=budget, score_col="score", cost_col="n_tokens"
            ).collect()
        )
        assert got == greedy(budget), f"budget={budget}"
        sel = pdf[pdf.doc_id.isin(got)]
        assert int(sel.n_tokens.sum()) <= budget or budget > total


def test_epoch_shuffle_rejects_degenerate_shards(spark):
    from ccnet_spark_spark.operators import sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    with pytest.raises(ValueError, match="shard_chars"):
        sample.epoch_shuffle(docs, epoch=0, shard_chars=0)
    with pytest.raises(ValueError, match="clobber"):
        sample.epoch_shuffle(docs.withColumn("pos", F.lit(1)), epoch=0)


# ------------------------------------------------- hard-negative mining
def test_hard_negatives_semantics(spark):
    from ccnet_spark_spark.operators import similarity
    from ccnet_spark_spark.operators.multimodal import caption_embedding, image_embedding
    from ccnet_spark_spark.synth import generate_pairs

    pairs = generate_pairs(spark, 120)
    img = image_embedding(pairs.where(F.col("image_id") < "img0000000015"))
    cap = caption_embedding(pairs)
    out = similarity.hard_negatives(
        img, cap, id_col="image_id", vec_col="embedding", k=2, n_planes=3, dim=64, seed=5
    ).toPandas()
    # never the positive (own caption), ranks contiguous, cosine sorted
    assert (out.query_id != out.negative_id).all()
    for _, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert list(g.cosine) == sorted(g.cosine, reverse=True)
    # the plan is the bucket equi-join shape, never all-pairs
    plan = (
        similarity.hard_negatives(img, cap, id_col="image_id", vec_col="embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the query tower must BROADCAST into the bucket join (a plain join on
    # an 8-value bucket key would funnel the corpus through 8 tasks)
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------- full release pipeline
def test_dataset_release_invariants(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = entry.q_dataset_release(spark, sf).toPandas()
    assert len(out) > 0
    # budget respected
    assert int(out.n_tokens.sum()) <= 5_000
    # the eval slice (doc_id % 50 == 0) is drawn from the corpus, so every
    # released doc must NOT be an exact eval leak
    assert not (out.doc_id % 50 == 0).any()
    # training order is complete and contiguous per shard
    for _, g in out.groupby("shard"):
        assert sorted(g.pos) == list(range(1, len(g) + 1))
    # released docs all pass the word gates
    from ccnet_spark_spark.operators import quality_rules

    docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select("doc_id", "text")
    gate = quality_rules.gopher_word_rules(docs, min_words=40).toPandas().set_index("doc_id")
    assert gate.loc[out.doc_id].keep.all()


def test_pairs_release_invariants(spark):
    import __spark_entry__ as entry

    out = entry.q_pairs_release(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    # corrupt plants and byte-copy plants never reach the manifest
    assert not out.image_id.str.startswith(("img_bad_", "img_dims_")).any()
    assert not out.image_id.str.endswith("_copy").any()
    # the per-language cap holds (null lang is its own group)
    assert out.groupby(out.lang.fillna("__null__")).size().max() <= 10
