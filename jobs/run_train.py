"""Production entry point: spark-submit job for the in-engine TRAINERS.

The reference consumes pre-trained artifacts (fastText LID binary, KenLM
.arpa, SentencePiece model, cutoff.csv) and never ships the training
step; this job exposes the engine's trainer family as a standalone pass
that writes each artifact as a parquet table a later pipeline run (or a
different stack entirely) loads back.

Ships as:
    zip -r engine.zip ccnet_spark_spark
    spark-submit --py-files engine.zip jobs/run_train.py \
        --mode lm --input <table> --output <dir> \
        [--text-col text] [--lang-col lang] [--label-col label]

Modes:
    lm       add-1 word-bigram LM per language (operators/lm.py):
             writes <output>/bigrams, /contexts, /vocab
    nb-lid   char-trigram Naive-Bayes LID (operators/nb_lid.py):
             writes <output>/grams, /langs (+ scalars in /meta)
    probe    ridge linear quality probe (operators/probe.py; requires
             --label-col, an int 0/1 column): writes /weights
    dsir     DSIR importance model (operators/dsir.py; requires --target,
             a second input table): writes /model (+ scalars in /meta)
    cutoffs  per-language perplexity percentile matrix
             (bucket.train_cutoff_matrix over --pp-col): writes /matrix
    bpe      BPE merge table + tokenized vocab (operators/bpe.py):
             writes /merges, /vocab
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    """stop_session=False lets in-process callers (tests) keep their shared
    session alive."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True, choices=["lm", "nb-lid", "probe", "dsir", "cutoffs", "bpe"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--label-col", default=None, help="probe mode: int 0/1 label column")
    ap.add_argument("--target", default=None, help="dsir mode: target-distribution table")
    ap.add_argument("--pp-col", default="perplexity", help="cutoffs mode: perplexity column")
    ap.add_argument("--num-merges", type=int, default=16, help="bpe mode")
    ap.add_argument(
        "--batch-size",
        type=int,
        default=1,
        help="bpe mode: merges per Spark round. Default 1 = classic "
        "sequential BPE (matches the engine's pinned fixtures and "
        "bpe_vocab/bpe_encode contract output); >1 is the real-scale "
        "batched schedule, which legitimately diverges near vocab "
        "exhaustion (see operators/bpe.py)",
    )
    args = ap.parse_args(argv)

    from ccnet_spark_spark.session import get_spark

    spark = get_spark(app_name=f"ccnet_train_{args.mode}")
    df = spark.read.parquet(args.input)
    out = args.output.rstrip("/")
    written: list[tuple[str, int]] = []

    def write(name: str, frame) -> None:
        path = f"{out}/{name}"
        frame.write.mode("overwrite").parquet(path)
        written.append((name, spark.read.parquet(path).count()))

    if args.mode == "lm":
        from ccnet_spark_spark.operators import lm

        model = lm.train_bigram_lm(df, args.text_col, args.lang_col)
        write("bigrams", model["bigrams"])
        write("contexts", model["contexts"])
        write("vocab", model["vocab"])
    elif args.mode == "nb-lid":
        from ccnet_spark_spark.operators import nb_lid

        model = nb_lid.train_nb_lid(df, args.text_col, args.lang_col)
        write("grams", model["grams"])
        write("langs", model["langs"])
        write("meta", spark.createDataFrame([(model["v"], model["n_total"])], "v long, n_total long"))
    elif args.mode == "probe":
        if not args.label_col:
            ap.error("--mode probe requires --label-col")
        from ccnet_spark_spark.operators import probe

        langs = sorted(
            r[0] for r in df.select(args.lang_col).where(df[args.lang_col].isNotNull()).distinct().collect()
        )
        w = probe.train_ridge(df, args.label_col, args.text_col, args.lang_col, tuple(langs))
        write(
            "weights",
            spark.createDataFrame(list(zip(probe.feature_names(tuple(langs)), w)), "feature string, weight double"),
        )
    elif args.mode == "dsir":
        if not args.target:
            ap.error("--mode dsir requires --target")
        from ccnet_spark_spark.operators import dsir

        target = spark.read.parquet(args.target)
        model = dsir.train_dsir(target, df, args.text_col)
        write("model", model["model"])
        write(
            "meta",
            spark.createDataFrame(
                [(model["unseen_delta"], model["n_target"], model["n_raw"])],
                "unseen_delta double, n_target long, n_raw long",
            ),
        )
    elif args.mode == "cutoffs":
        from ccnet_spark_spark.operators import bucket

        write("matrix", bucket.train_cutoff_matrix(df, pp_col=args.pp_col, lang_col=args.lang_col))
    else:  # bpe
        from ccnet_spark_spark.operators import bpe

        merges, vocab = bpe.train_bpe(
            spark, df, args.text_col, num_merges=args.num_merges, batch_size=args.batch_size
        )
        write("merges", merges)
        write("vocab", vocab)

    print(
        "run_train: mode=%s wrote %s to %s"
        % (args.mode, ", ".join(f"{n}={c} rows" for n, c in written), out)
    )
    if stop_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
