"""Smoke the standalone dedup job CLI (jobs/run_dedup.py) end-to-end:
every mode reads a parquet table, writes a parquet result, and the row
sets match the operator invoked directly."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

import run_dedup  # noqa: E402


@pytest.fixture()
def corpus_paths(spark, tmp_path):
    # letter-distinct texts (ccnet normalize maps digits to zero)
    def word(i):
        return "".join(chr(ord("a") + int(d)) for d in str(i))

    # every doc gets a fully distinct 8-word text (no shared trigrams between
    # different docs, so LSH near-dedup must not collapse them)
    def text(i):
        return " ".join(word(i * 31 + 7 * k + 1) for k in range(8))

    docs = spark.createDataFrame(
        [(i, text(i)) for i in range(40)]
        # 10 exact duplicates of docs 0-9
        + [(100 + i, text(i)) for i in range(10)],
        ["doc_id", "text"],
    )
    inp = str(tmp_path / "input")
    docs.write.parquet(inp)
    return inp, tmp_path


def test_run_dedup_exact(spark, corpus_paths):
    inp, tmp = corpus_paths
    out = str(tmp / "out_exact")
    assert run_dedup.main(["--input", inp, "--output", out, "--mode", "exact"]) == 0
    ids = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert ids == list(range(40))  # min-id survivors only


def test_run_dedup_lsh(spark, corpus_paths):
    inp, tmp = corpus_paths
    out = str(tmp / "out_lsh")
    assert run_dedup.main(["--input", inp, "--output", out, "--mode", "lsh"]) == 0
    ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert set(range(40)).issubset(ids) and not any(i >= 100 for i in ids)


def test_run_dedup_passage_trim(spark, corpus_paths):
    inp, tmp = corpus_paths
    out = str(tmp / "out_trim")
    assert run_dedup.main(
        ["--input", inp, "--output", out, "--mode", "passage-trim", "--gram-n", "4"]
    ) == 0
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert len(rows) == 50  # trimmer keeps every row
    assert rows[0]["trimmed_text"] == ""  # fully-duplicated doc emptied


def test_run_dedup_incremental_bloom(spark, corpus_paths, tmp_path):
    inp, tmp = corpus_paths
    committed = str(tmp_path / "committed")
    spark.read.parquet(inp).where("doc_id < 20").write.parquet(committed)
    for flag, name in ([], "out_inc"), (["--bloom"], "out_inc_bloom"):
        out = str(tmp / name)
        rc = run_dedup.main(
            ["--input", inp, "--output", out, "--mode", "incremental", "--corpus", committed]
            + flag
        )
        assert rc == 0
    a = sorted(r["doc_id"] for r in spark.read.parquet(str(tmp / "out_inc")).collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(str(tmp / "out_inc_bloom")).collect())
    assert a == b == list(range(20, 40))  # committed + their dups gone, batch-dups collapsed


def test_run_dedup_decontaminate(spark, tmp_path):
    """--mode decontaminate: rows whose fingerprint sits within the radius
    of an eval-set fingerprint are dropped; --eval-set is required."""
    import numpy as np

    rng = np.random.default_rng(11)
    hashes = [int(h) for h in rng.integers(-(1 << 63), 1 << 63, size=60, dtype=np.int64)]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], ["doc_id", "phash"]
    )
    # eval set: perturbations of rows 0-4 at hamming 2 (one low window,
    # one top window) + one far hash
    evals = spark.createDataFrame(
        [(hashes[i] ^ 3,) for i in range(3)]
        + [(hashes[i] ^ ((1 << 50) | (1 << 55)),) for i in range(3, 5)]
        + [(hashes[5] ^ 0x0F0F0F0F0F0F,)],
        ["phash"],
    )
    inp, ev, out = str(tmp_path / "in"), str(tmp_path / "ev"), str(tmp_path / "out")
    df.write.parquet(inp)
    evals.write.parquet(ev)
    assert run_dedup.main(
        ["--input", inp, "--output", out, "--mode", "decontaminate", "--eval-set", ev]
    ) == 0
    ids = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert ids == sorted(set(range(60)) - set(range(5)))

    import pytest as _pytest

    with _pytest.raises(SystemExit):
        run_dedup.main(["--input", inp, "--output", out, "--mode", "decontaminate"])
