"""Round-5 additions: batched BPE training, localCheckpoint storage
release, and StagedParquetWriter isolation/empty-write fixes."""

from __future__ import annotations

import os

import pandas as pd
import pytest

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


# ---------------------------------------------------------------- batched BPE


def test_select_disjoint_rules():
    """Greedy symbol-disjoint selection: shared left/right blocks, a
    candidate whose merged string collides with a selected symbol or
    merged string blocks, cap respected, order preserved."""
    from ccnet_spark_spark.operators.bpe import select_disjoint

    cands = [
        ("a", "b", 10),  # selected
        ("b", "c", 9),  # blocked: shares b
        ("c", "d", 8),  # selected
        ("x", "cd", 7),  # blocked: cd is a selected merged string
        ("a", "a", 6),  # blocked: shares a
        ("e", "f", 5),  # selected
        ("g", "h", 4),  # beyond cap
    ]
    got = select_disjoint(cands, 3)
    assert got == [("a", "b", 10), ("c", "d", 8), ("e", "f", 5)]
    # batch_size=1 == classic argmax
    assert select_disjoint(cands, 1) == [("a", "b", 10)]
    # merged-string collision in the other direction: selecting (a,b)->ab
    # blocks a later candidate whose SYMBOL is ab
    got2 = select_disjoint([("a", "b", 10), ("ab", "q", 9), ("q", "r", 8)], 3)
    assert got2 == [("a", "b", 10), ("q", "r", 8)]


def test_bpe_batched_hand_computed(spark):
    """'ab ab ab abc abc zz', batch_size=2. Round 1 candidates sorted:
    (a,b)=5, (b,c)=2, (z,z)=1 -> select (a,b); (b,c) blocked (shares b);
    select (z,z). Round 2: only (ab,c)=2 remains -> rank 2. The batched
    ORDER differs from classic ([ab, abc, zz]) exactly as documented:
    the mid-batch pair (ab,c) waits one round."""
    from ccnet_spark_spark.operators import bpe

    docs = spark.createDataFrame([(1, "ab ab ab abc abc zz")], ["doc_id", "text"])
    merges, vocab = bpe.train_bpe(spark, docs, "text", num_merges=5, batch_size=2)
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in merges.orderBy("rank").collect()
    ]
    assert got == [(0, "a", "b", 5), (1, "z", "z", 1), (2, "ab", "c", 2)]
    v = {r["word"]: r["symbols"] for r in vocab.collect()}
    assert v == {"ab": "ab", "abc": "abc", "zz": "zz"}


def test_bpe_batched_fixture_exact(spark):
    """batch_size=16 / num_merges=128 over the sf0.001 documents table must
    reproduce the INDEPENDENT batched-schedule fixture bit-for-bit — merge
    table (order, pairs, counts) and final vocab. The 31-word corpus
    exhausts at ~89 merges, identically on both sides."""
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("no sf0.001 testdata")
    from ccnet_spark_spark.operators import bpe

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    merges, vocab = bpe.train_bpe(spark, docs, "text", num_merges=128, batch_size=16)
    mp = merges.orderBy("rank").toPandas().astype({"rank": "int32"}).reset_index(drop=True)
    fm = pd.read_parquet(os.path.join(FIX, "bpe_merges_b16_sf0.001.parquet"))
    assert len(mp) == len(fm) and len(mp) < 128  # exhaustion, same on both sides
    pd.testing.assert_frame_equal(mp, fm)
    vp = (
        vocab.orderBy("word")
        .toPandas()[["word", "symbols", "freq"]]
        .astype({"freq": "int64"})
        .reset_index(drop=True)
    )
    fv = pd.read_parquet(os.path.join(FIX, "bpe_vocab_b16_sf0.001.parquet")).astype(
        {"freq": "int64"}
    )
    pd.testing.assert_frame_equal(vp, fv)


def test_bpe_batch1_unchanged(spark):
    """batch_size=1 must remain classic BPE — same result as the r4
    sequential trainer on the hand-computed corpus (regression guard for
    the batching rewrite)."""
    from ccnet_spark_spark.operators import bpe

    docs = spark.createDataFrame([(1, "ab ab ab abc abc zz")], ["doc_id", "text"])
    merges, _ = bpe.train_bpe(spark, docs, "text", num_merges=3, batch_size=1)
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in merges.orderBy("rank").collect()
    ]
    assert got == [(0, "a", "b", 5), (1, "ab", "c", 2), (2, "z", "z", 1)]


# ------------------------------------------------- localCheckpoint release


def test_release_local_checkpoint_frees_blocks(spark):
    """Dataset.unpersist() does NOT free localCheckpoint blocks (verified:
    they stay in getRDDStorageInfo); release_local_checkpoint must.
    Tracks the checkpoint's OWN rdd id — total storage-entry counts are
    flaky (the ContextCleaner may concurrently drop older entries)."""
    from ccnet_spark_spark.session import release_local_checkpoint

    def cached_ids():
        info = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return {i.id() for i in info if i.numCachedPartitions() > 0}

    a = spark.range(10000).selectExpr("id", "id * 2 as x").localCheckpoint()
    rid = a._jdf.queryExecution().analyzed().rdd().id()
    assert rid in cached_ids()
    release_local_checkpoint(a)
    assert rid not in cached_ids()
    # best-effort: a non-checkpointed frame is a silent no-op
    release_local_checkpoint(spark.range(5))


def test_bpe_trainer_releases_round_checkpoints(spark):
    """After training, executor storage must NOT hold one vocab copy per
    merge round — only the final checkpoint survives."""
    from ccnet_spark_spark.operators import bpe

    def n_cached():
        info = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return len([i for i in info if i.numCachedPartitions() > 0])

    base = n_cached()
    docs = spark.createDataFrame(
        [(1, "ab ab ab abc abc zz xyzw xyzw qrst")], ["doc_id", "text"]
    )
    merges, vocab = bpe.train_bpe(spark, docs, "text", num_merges=6, batch_size=1)
    assert merges.count() >= 4  # several rounds actually ran
    assert n_cached() <= base + 1  # only the final vocab checkpoint remains


# ------------------------------------------------ bloom probe strategies


def test_bloom_probe_strategies_agree(spark):
    """The broadcast/numpy probe (large-bloom scale path) must return
    bit-identical verdicts to the hex-string-literal probe (small-bloom
    codegen path), including zero false negatives for every built key."""
    from pyspark.sql import functions as F

    from ccnet_spark_spark.operators import dedup

    keys = spark.range(2000).select(F.concat(F.lit("k"), F.col("id")).alias("hv"))
    words = dedup.build_bloom_words(keys, "hv", m_bits=1 << 14)
    probe_df = spark.range(4000).select(F.concat(F.lit("k"), F.col("id")).alias("hv"))
    lit_hits = {
        r["hv"]: r["_bloom_hit"]
        for r in dedup.bloom_might_contain(probe_df, "hv", words, strategy="literal").collect()
    }
    bc_hits = {
        r["hv"]: r["_bloom_hit"]
        for r in dedup.bloom_might_contain(probe_df, "hv", words, strategy="broadcast").collect()
    }
    assert lit_hits == bc_hits
    # no false negatives: every built key must hit
    for i in range(2000):
        assert lit_hits[f"k{i}"] is True


# ------------------------------------------- StagedParquetWriter isolation


class _Msg:
    def __init__(self, staged):
        self.staged = staged


def _make_writer(path, overwrite=False):
    from ccnet_spark_spark.sources.pairs_source import StagedParquetWriter

    class _Schema:
        names = ["doc_id", "text"]

    return StagedParquetWriter({"path": path}, _Schema(), overwrite)


def test_staged_writer_empty_write_to_missing_path(tmp_path):
    """A fully-empty write to a not-yet-existing target dir must still
    commit: makedirs + _SUCCESS, no crash (every partition empty means
    write() never created the dir)."""
    target = str(tmp_path / "out")
    w = _make_writer(target)
    msgs = [w.write(iter([])), w.write(iter([]))]
    assert all(m.staged == "" for m in msgs)
    w.commit(msgs)
    assert os.path.exists(os.path.join(target, "_SUCCESS"))
    assert not [f for f in os.listdir(target) if f.endswith(".parquet")]


def test_custom_sink_crash_between_staging_and_commit_streaming(spark, tmp_path):
    """VERDICT r4 stretch: the custom two-phase-commit sink driven by a
    foreachBatch stream that DIES between staging and commit, then
    restarts from the same checkpoint. Readers must see old-complete
    (the pre-crash publish) during the failure window and new-complete
    after the replay — never a mix. The crash is injected via the sink's
    filesystem fault hook because the commit planner runs in a separate
    Python worker process."""
    import time

    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from ccnet_spark_spark.sources.pairs_source import PairsDataSource

    em._ensure_pkg(spark)
    spark.dataSource.register(PairsDataSource)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_src(tag, n):
        spark.createDataFrame(
            [(f"{tag}{i}", f"caption {tag} {i}") for i in range(n)],
            "doc_id string, text string",
        ).coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        stream = spark.readStream.schema("doc_id string, text string").parquet(src)

        def sink_batch(df, _bid):
            # publish-latest pattern: every micro-batch overwrites the
            # published table through the 2PC custom sink
            df.write.format("ccnet_pairs").mode("overwrite").option("path", out).save()

        return (
            stream.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def published():
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            return None
        return {r["doc_id"] for r in spark.read.parquet(out).collect()}

    # batch 1 commits cleanly
    write_src("a", 5)
    q = run_stream()
    q.awaitTermination(120)
    assert published() == {f"a{i}" for i in range(5)}

    # batch 2: crash injected between staging and commit
    with open(os.path.join(out, "_FAULT_CRASH_COMMIT"), "w"):
        pass
    write_src("b", 7)
    q = run_stream()
    failed = False
    try:
        q.awaitTermination(120)
        failed = q.exception() is not None
    except Exception:
        failed = True
    assert failed, "stream must fail on the injected commit crash"
    # old publish intact, no partial rows from the crashed attempt
    assert published() == {f"a{i}" for i in range(5)}
    assert os.path.exists(os.path.join(out, "_FAULT_CRASH_DONE"))

    # restart from the SAME checkpoint: batch 2 replays and commits. The
    # publish-latest overwrite means the replayed batch's rows (only the
    # b-file — the a-file's batch is already checkpoint-committed)
    # REPLACE the previous publish.
    q = run_stream()
    q.awaitTermination(120)
    want = {f"b{i}" for i in range(7)}
    deadline = time.time() + 60
    while time.time() < deadline and published() != want:
        time.sleep(1)
    assert published() == want
    # an orphaned staging dir (hard kill, no abort) is invisible to
    # readers: underscore-prefixed dirs are excluded by convention
    orphan = os.path.join(out, "_staging-deadbeef")
    os.makedirs(orphan)
    spark.createDataFrame([("zz", "junk")], "doc_id string, text string").toPandas().to_parquet(
        os.path.join(orphan, "part-junk.parquet"), index=False
    )
    assert published() == want


def test_staged_writer_concurrent_writes_isolated(tmp_path):
    """Two writers targeting the SAME path stage into disjoint dirs: one
    job's commit (or abort) must never delete the other's staged files or
    published output."""
    target = str(tmp_path / "out")
    a = _make_writer(target)
    b = _make_writer(target)
    assert a.staging != b.staging
    ma = a.write(iter([("d1", "from-a")]))
    mb = b.write(iter([("d2", "from-b")]))
    # a commits while b is still staged: b's file must survive
    a.commit([ma])
    assert os.path.exists(mb.staged)
    b.commit([mb])
    out = pd.read_parquet(target)
    assert sorted(out["doc_id"]) == ["d1", "d2"]
    # abort of a third writer leaves published data alone
    c = _make_writer(target)
    c.write(iter([("d3", "aborted")]))
    c.abort([])
    out2 = pd.read_parquet(target)
    assert sorted(out2["doc_id"]) == ["d1", "d2"]
    assert not os.path.exists(c.staging)


# ------------------------------------------- curated pipeline composition


def test_curated_pipeline_cascade(spark):
    """Config(caption_budget, model_gates) composes the DataComp cascade
    in cost order: the 20 stock-caption plants (gate-passing metadata)
    die at the BUDGET stage, never reaching the towers; survivors are a
    subset of the gates-only run; NULL captions are budget-exempt."""
    import pyspark.sql.functions as F

    from ccnet_spark_spark.operators.image_quality import keep_expr
    from ccnet_spark_spark.plans.pipeline import Config, Pipeline
    from ccnet_spark_spark.synth import generate_pairs

    from __spark_entry__ import _cutoffs

    base = generate_pairs(spark, 400)
    plants = base.where(keep_expr() & (F.col("image_id") < "img0000000100")).select(
        F.concat("image_id", F.lit("_bp")).alias("image_id"),
        "bytes",
        "w",
        "h",
        "fmt",
        F.lit("stock photo of a generic product").alias("caption"),
        "phash",
    )
    corpus = base.unionByName(plants)
    assert plants.count() == 20

    gated = Pipeline(spark, Config(cutoffs=_cutoffs(), image_gates=True)).run(corpus)
    gated_ids = {r[0] for r in gated.select("image_id").collect()}
    # plants pass the metadata gates (they were selected to)
    assert sum(1 for i in gated_ids if i.endswith("_bp")) == 20

    budgeted = Pipeline(
        spark, Config(cutoffs=_cutoffs(), image_gates=True, caption_budget=10)
    ).run(corpus)
    budgeted_ids = {r[0] for r in budgeted.select("image_id").collect()}
    # ... and ALL die at the budget; no base row does (unique captions)
    assert not any(i.endswith("_bp") for i in budgeted_ids)
    assert budgeted_ids == {i for i in gated_ids if not i.endswith("_bp")}

    curated = Pipeline(
        spark,
        Config(cutoffs=_cutoffs(), image_gates=True, caption_budget=10, model_gates=True),
    ).run(corpus)
    curated_ids = {r[0] for r in curated.select("image_id").collect()}
    assert curated_ids and curated_ids < budgeted_ids


def test_caption_budget_null_exempt(spark):
    """NULL captions pass the budget stage regardless of group size (the
    metadata gates own NULL captions; gates off here to isolate it)."""
    from ccnet_spark_spark.plans.pipeline import Config, Pipeline

    rows = [("d%02d" % i, None) for i in range(20)] + [("k%02d" % i, "una palabra distinta %d" % i) for i in range(3)]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    out = Pipeline(spark, Config(caption_budget=10)).run(df)
    ids = {r[0] for r in out.select("image_id").collect()}
    assert {"d%02d" % i for i in range(20)} <= ids


def test_model_gates_requires_pair_schema(spark):
    """model_gates hard-fails on a non-pair schema instead of silently
    embedding the wrong columns."""
    import pytest as _pytest

    from ccnet_spark_spark.plans.pipeline import Config, Pipeline

    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with _pytest.raises(ValueError, match="model_gates"):
        Pipeline(spark, Config(model_gates=True)).run(df, id_col="doc_id", text_col="text")


# ------------------------------------------- fused model-gate passthrough


def test_fused_model_gates_equal_join_form(spark):
    """model_gate_passthrough (zero-shuffle fused form) keeps EXACTLY the
    rows the join form keeps, over the whole 400-pair corpus — the engine-
    internal pin that lets either form back the curated cascade."""
    from ccnet_spark_spark.plans.pipeline import Config, Pipeline
    from ccnet_spark_spark.synth import generate_pairs

    from __spark_entry__ import _cutoffs

    base = generate_pairs(spark, 400)
    join_cfg = Config(cutoffs=_cutoffs(), image_gates=True, caption_budget=10, model_gates=True)
    fused_cfg = Config(
        cutoffs=_cutoffs(),
        image_gates=True,
        caption_budget=10,
        model_gates=True,
        model_gates_mode="fused",
    )
    a = Pipeline(spark, join_cfg).run(base)
    b = Pipeline(spark, fused_cfg).run(base)
    cols = [c for c in a.columns if c != "bytes"]
    ra = sorted(repr(tuple(r)) for r in a.select(*cols).collect())
    rb = sorted(repr(tuple(r)) for r in b.select(*cols).collect())
    assert ra == rb


def test_fused_gate_null_payload_fails_closed(spark):
    from pyspark.sql import functions as F

    from ccnet_spark_spark.operators.multimodal import model_gate_passthrough
    from ccnet_spark_spark.synth import generate_pairs

    pairs = generate_pairs(spark, 3).withColumn(
        "bytes", F.when(F.col("image_id") != "img0000000000", F.col("bytes"))
    )
    out = {r["image_id"]: r for r in model_gate_passthrough(pairs).collect()}
    assert out["img0000000000"]["model_keep"] is False
    assert out["img0000000000"]["aligned"] is False


def test_model_gates_mode_validated(spark):
    import pytest as _pytest

    from ccnet_spark_spark.plans.pipeline import Config, Pipeline
    from ccnet_spark_spark.synth import generate_pairs

    with _pytest.raises(ValueError, match="model_gates_mode"):
        Pipeline(spark, Config(model_gates=True, model_gates_mode="bogus")).run(
            generate_pairs(spark, 2)
        )


# ----------------------------------------------------------- group_quota


def test_group_quota_caps_and_determinism(spark):
    """At most `quota` rows per group; exact-quota groups kept whole;
    selection invariant under repartition (content-defined)."""
    from ccnet_spark_spark.operators.sample import group_quota

    rows = [(f"d{i:03d}", "big") for i in range(40)]
    rows += [(f"e{i:03d}", "exact") for i in range(10)]
    rows += [(f"s{i:03d}", "small") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    out = group_quota(df, "lang", 10, id_col="doc_id")
    got = {}
    for r in out.collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(got["big"]) == 10
    assert len(got["exact"]) == 10
    assert len(got["small"]) == 4
    again = group_quota(df.repartition(13), "lang", 10, id_col="doc_id")
    got2 = {}
    for r in again.collect():
        got2.setdefault(r["lang"], set()).add(r["doc_id"])
    assert got == got2


def test_group_quota_null_group_capped(spark):
    """NULL groups are ONE group (null-safe cutoff join), capped like any
    other — not silently kept whole."""
    from ccnet_spark_spark.operators.sample import group_quota

    rows = [(f"n{i:03d}", None) for i in range(20)] + [("a1", "en")]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    out = group_quota(df, "lang", 5, id_col="doc_id").collect()
    nulls = [r for r in out if r["lang"] is None]
    assert len(nulls) == 5
    assert [r["doc_id"] for r in out if r["lang"] == "en"] == ["a1"]


def test_group_quota_validates(spark):
    import pytest as _pytest

    from ccnet_spark_spark.operators.sample import group_quota
    from ccnet_spark_spark.synth import generate_pairs

    with _pytest.raises(ValueError, match="quota"):
        group_quota(generate_pairs(spark, 2), "fmt", 0)


def test_group_quota_cutoff_join_is_broadcast(spark):
    """The scale contract: the cutoff table broadcasts; the full rows
    reach the filter without an exchange of their own (the only shuffle
    in the plan is the narrow window's)."""
    from ccnet_spark_spark.operators.sample import group_quota
    from ccnet_spark_spark.synth import generate_pairs

    out = group_quota(generate_pairs(spark, 50), "fmt", 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import re

    shuffles = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert all("__gq_g" in s for s in shuffles), shuffles


# -------------------------------------------------------- weighted_repeat


def test_weighted_repeat_factors(spark):
    """Whole factors copy exactly; fractional factors add the extra copy
    for ~frac of ids; factor 0 drops the stratum; copies carry 1..n."""
    from ccnet_spark_spark.operators.sample import weighted_repeat

    rows = [(f"a{i:03d}", "two") for i in range(30)]
    rows += [(f"b{i:03d}", "half") for i in range(64)]
    rows += [(f"c{i:03d}", "drop") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    out = weighted_repeat(
        df, "lang", {"two": 2.0, "half": 0.5, "drop": 0.0}, id_col="doc_id"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r["copy_idx"])
    assert len(by["two"]) == 60 and sorted(set(by["two"])) == [1, 2]
    # ~50% of 64: binomial, bounds generous but meaningful
    assert 16 <= len(by["half"]) <= 48 and set(by["half"]) == {1}
    assert "drop" not in by


def test_weighted_repeat_deterministic_and_no_shuffle(spark):
    from ccnet_spark_spark.operators.sample import weighted_repeat

    rows = [(f"d{i:03d}", "en") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    a = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in weighted_repeat(df, "lang", {"en": 1.5}, id_col="doc_id").collect()
    )
    b = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in weighted_repeat(
            df.repartition(7), "lang", {"en": 1.5}, id_col="doc_id"
        ).collect()
    )
    assert a == b
    plan = (
        weighted_repeat(df, "lang", {"en": 1.5}, id_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan  # broadcast + map-side explode only


def test_weighted_repeat_validates(spark):
    import pytest as _pytest

    from ccnet_spark_spark.operators.sample import weighted_repeat
    from ccnet_spark_spark.synth import generate_pairs

    with _pytest.raises(ValueError, match="factors"):
        weighted_repeat(generate_pairs(spark, 2), "fmt", {"ppm": -1.0})


# ------------------------------------------------- image decontamination


def test_hash64_decontaminate_exact_vs_bruteforce(spark):
    """EXACTNESS of the rotated-prefix bucket recall: with prefix_bits=16
    and passes=4, the operator must equal the brute-force all-pairs radius
    predicate at max_hamming <= 3 on seeded-random 64-bit fingerprints
    (that equality is what licenses the plain-SQL DuckDB oracle)."""
    import numpy as np

    from ccnet_spark_spark.operators.dedup import hash64_decontaminate

    rng = np.random.default_rng(7)
    corpus_h = rng.integers(-(1 << 63), 1 << 63, size=200, dtype=np.int64)
    # eval = 25 perturbations of corpus hashes at hamming 1..3 with bit
    # positions spread across all four 16-bit windows + 15 fresh randoms
    evals = []
    for i in range(25):
        bits = rng.choice(64, size=(i % 3) + 1, replace=False)
        h = int(corpus_h[i * 7])
        for b in bits:
            h ^= 1 << int(b)
        evals.append(h - (1 << 64) if h >= 1 << 63 else h)
    evals += [int(x) for x in rng.integers(-(1 << 63), 1 << 63, size=15, dtype=np.int64)]

    df = spark.createDataFrame(
        [(f"id{i:04d}", int(h)) for i, h in enumerate(corpus_h)], "id string, h long"
    )
    edf = spark.createDataFrame([(h,) for h in evals], "eh long")
    got = sorted(
        r.id
        for r in hash64_decontaminate(
            df, edf, "id", "h", eval_hash_col="eh", prefix_bits=16, max_hamming=3, passes=4
        ).collect()
    )
    mask = (1 << 64) - 1
    want = sorted(
        f"id{i:04d}"
        for i, h in enumerate(corpus_h)
        if all(bin((int(h) ^ e) & mask).count("1") > 3 for e in evals)
    )
    assert got == want
    assert len(want) < 200  # the planted perturbations actually removed rows


def test_hash64_decontaminate_plan_broadcasts_eval(spark):
    """The eval side must reach the join as a broadcast (no shuffle of the
    corpus beyond the bucket projection) and the anti-join must prune the
    payload from the hit-id plan branches."""
    from ccnet_spark_spark.operators.dedup import hash64_decontaminate
    from ccnet_spark_spark.synth import generate_pairs

    base = generate_pairs(spark, 50).select("image_id", "phash")
    edf = base.limit(5).select(base.phash.alias("eval_phash"))
    out = hash64_decontaminate(base, edf, "image_id", "phash", eval_hash_col="eval_phash")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------- image metadata scrub


def test_strip_metadata_fidelity_and_idempotence():
    """Plant comments -> decode still works (comment-tolerant parser),
    scrub restores the EXACT original bytes, decoded pixels bit-identical
    at every step, scrub is idempotent, counts are right."""
    import numpy as np

    from ccnet_spark_spark import codecs

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for fmt, enc in (("ppm", codecs.encode_ppm), ("qjpg", codecs.encode_qjpg)):
        orig = enc(px)
        sp = orig.index(b" ")
        tagged = orig[:sp] + b"\n# Created by tool\n# GPS 1.5 2.5\n" + orig[sp + 1 :]
        # comment-tolerant decode sees the same pixels
        assert (codecs.decode(tagged, fmt) == codecs.decode(orig, fmt)).all()
        clean, n = codecs.strip_metadata(tagged, fmt)
        assert n == 2 and clean == orig
        again, n2 = codecs.strip_metadata(clean, fmt)
        assert n2 == 0 and again == clean
    # glued comment (no whitespace before '#') still terminates the token
    hdr = b"P6 5#c\n7 255\n" + bytes(5 * 7 * 3)
    clean, n = codecs.strip_metadata(hdr, "ppm")
    assert n == 1 and clean.startswith(b"P6 5 7 255\n")
    # error paths: unknown fmt gated, truncated header loud
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        codecs.strip_metadata(b"\xff\xd8", "jpeg")
    with _pytest.raises(ValueError):
        codecs.strip_metadata(b"P6 5 7", "ppm")


def test_scrub_image_metadata_operator(spark):
    """Spark-side: payload sha equality vs the pre-plant original, audit
    counts surface per row, pixels decode identically after scrub."""
    from ccnet_spark_spark import codecs
    from ccnet_spark_spark.operators.multimodal import scrub_image_metadata
    from ccnet_spark_spark.synth import generate_pairs

    base = generate_pairs(spark, 20).select("image_id", "bytes", "fmt")
    orig = {r["image_id"]: bytes(r["bytes"]) for r in base.collect()}

    def plant(pdf):
        pdf = pdf.copy()
        pdf["bytes"] = [
            bytearray(
                bytes(b)[: bytes(b).index(b" ")]
                + b"\n# Created by x\n"
                + bytes(b)[bytes(b).index(b" ") + 1 :]
            )
            for b in pdf["bytes"]
        ]
        return pdf

    tagged = base.toPandas().pipe(plant)
    out = scrub_image_metadata(spark.createDataFrame(tagged, schema=base.schema)).collect()
    assert len(out) == 20
    for r in out:
        assert r["n_meta_removed"] == 1
        assert bytes(r["bytes"]) == orig[r["image_id"]]
        assert (
            codecs.decode(bytes(r["bytes"]), r["fmt"]) == codecs.decode(orig[r["image_id"]], r["fmt"])
        ).all()


def test_pipeline_payload_scrub_stage(spark):
    """Config(payload_scrub=True): every payload goes through the
    metadata strip BEFORE any retention decision — output rows carry the
    n_meta_removed audit count and clean bytes equal to the pre-plant
    originals (pixels bit-identical by construction)."""
    from ccnet_spark_spark.plans.pipeline import Config, Pipeline
    from ccnet_spark_spark.synth import generate_pairs

    base = generate_pairs(spark, 30)
    orig = {r["image_id"]: bytes(r["bytes"]) for r in base.select("image_id", "bytes").collect()}

    def plant(pdf):
        import pandas as _pd  # noqa: F401

        pdf = pdf.copy()
        pdf["bytes"] = [
            bytearray(
                bytes(b)[: bytes(b).index(b" ")] + b"\n# GPS 1 2\n" + bytes(b)[bytes(b).index(b" ") + 1 :]
            )
            for b in pdf["bytes"]
        ]
        return pdf

    tagged = spark.createDataFrame(base.toPandas().pipe(plant), schema=base.schema)
    out = Pipeline(spark, Config(payload_scrub=True)).run(tagged).collect()
    assert len(out) == 30
    for r in out:
        assert r["n_meta_removed"] == 1
        assert bytes(r["bytes"]) == orig[r["image_id"]]
