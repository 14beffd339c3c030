"""Production entry point: spark-submit job for the corpus-dedup families
(the reference ships only the in-pipeline line dedup; this exposes the
engine's document/passage-level dedup operators as a standalone job the
way a training-data team actually runs them — dedup as its own pass
between ingest and tokenization).

Ships as:
    zip -r engine.zip ccnet_spark_spark
    spark-submit --py-files engine.zip jobs/run_dedup.py \
        --input <table> --output <table> --mode exact \
        [--id-col doc_id] [--text-col text]

Modes:
    exact         keep-min exact dedup on normalized text hash
    lsh           MinHash-LSH near-dedup (xxhash64 production path)
    passage-trim  cut duplicated passages out of every doc, keep all rows
    incremental   dedup --input batch against --corpus, exact (add --bloom
                  for the Bloom-prefiltered plan at large corpus scale)
    decontaminate drop --input rows whose 64-bit fingerprint (--hash-col,
                  default phash) is within --max-hamming of any row of
                  --eval-set — image-side benchmark decontamination; the
                  default radius 3 with 4 rotated 16-bit prefix passes is
                  exact (see dedup.hash64_decontaminate)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--mode",
        required=True,
        choices=["exact", "lsh", "passage-trim", "incremental", "decontaminate"],
    )
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--corpus", default=None, help="incremental mode: the committed corpus table")
    ap.add_argument("--bloom", action="store_true", help="incremental mode: Bloom-prefiltered plan")
    ap.add_argument("--eval-set", default=None, help="decontaminate mode: eval fingerprint table")
    ap.add_argument("--hash-col", default="phash", help="decontaminate mode: fingerprint column")
    ap.add_argument("--max-hamming", type=int, default=3, help="decontaminate mode: radius")
    ap.add_argument("--gram-n", type=int, default=8, help="passage-trim anchor n-gram size")
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--num-bands", type=int, default=4)
    ap.add_argument("--shingle-n", type=int, default=3)
    args = ap.parse_args(argv)

    from ccnet_spark_spark.operators import dedup, passages
    from ccnet_spark_spark.session import get_spark

    spark = get_spark(app_name=f"ccnet_dedup_{args.mode}")
    df = spark.read.parquet(args.input)
    if args.mode == "exact":
        out = dedup.exact_dedup(df, args.id_col, args.text_col)
    elif args.mode == "lsh":
        out = dedup.minhash_lsh_dedup(
            df,
            args.id_col,
            args.text_col,
            num_hashes=args.num_hashes,
            num_bands=args.num_bands,
            shingle_n=args.shingle_n,
            algo="xxhash64",
        )
    elif args.mode == "passage-trim":
        out = passages.trim_duplicate_passages(
            df, args.id_col, args.text_col, gram_n=args.gram_n
        )
    elif args.mode == "incremental":
        if not args.corpus:
            ap.error("--mode incremental requires --corpus")
        corpus = spark.read.parquet(args.corpus)
        fn = dedup.incremental_dedup_bloom if args.bloom else dedup.incremental_dedup
        out = fn(df, corpus, args.id_col, args.text_col)
    else:  # decontaminate
        if not args.eval_set:
            ap.error("--mode decontaminate requires --eval-set")
        evals = spark.read.parquet(args.eval_set)
        # keep the exactness guarantee whenever the radius allows it: with
        # w-bit prefix windows and 64/w rotated passes, any pair at
        # hamming <= 64/w - 1 has a clean window. Radius <= 7 stays exact
        # (>= 8-bit prefixes keep buckets selective); beyond that the
        # rotation passes are best-effort recall, as documented on the op.
        windows = max(args.max_hamming + 1, 4)
        prefix = max(64 // windows, 8)
        out = dedup.hash64_decontaminate(
            df,
            evals,
            args.id_col,
            args.hash_col,
            prefix_bits=prefix,
            max_hamming=args.max_hamming,
            passes=64 // prefix,
        )
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"run_dedup: mode={args.mode} wrote {n} rows to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
