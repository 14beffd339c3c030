"""Synthesize a deterministic sf1 (10x sf0.1) table set under /tmp/sf1.

The driver provides testdata only up to sf0.1 (TESTDATA.md) and
/root/testdata is read-only, so the 10x correctness+bench datapoint
(VERDICT r4 #6) runs on a locally-derived sf1: every oracle check
compares Spark vs DuckDB ON THE SAME INPUT, so any deterministic input
of the right shape validates the plans and twins at 10x — no external
data, rebuildable from this script.

Construction (seedless, pure functions of the sf0.1 rows):
- documents: 10 replicas. Replica 0 is sf0.1 verbatim; replica r
  appends a replica-distinct LETTER token " repz<letter r>" to every
  text (letters because ccnet dedup-normalization maps digits to 0 —
  digit suffixes would collapse replicas to one hash) and offsets
  doc_id by 10M*r (clear of every planted-id offset the contract uses:
  +100k/+200k/+300k/+400k/+900k). Within-replica duplicate structure
  (planted dup lines etc.) is preserved exactly; across replicas all
  hashes are distinct. n_chars is recomputed for consistency.
- events: 10 replicas, event_id/user_id offset by 10M*r, ts unchanged
  (10x the rows per window — heavier aggregation states).
- embeddings: 10 replicas, vec_id offset 10M*r, component 0 perturbed
  by +0.0017*r so no two replicas' vectors are cosine-identical
  (identical vectors would create cross-replica top-k TIES, making
  ANN orderings ambiguous between engines).
- all other tables: copied verbatim (dimension tables; barely used by
  the contract).

Usage: python tools/make_sf1.py [outdir=/tmp/sf1]
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1 python tools/check_oracle.py
       SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
(Generate sf1 fixtures first: the __main__ below calls make_fixtures
for simhash + classic/batched BPE over the new dir.)
"""

from __future__ import annotations

import os
import shutil
import string
import sys

import pandas as pd

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
STRIDE = 10_000_000


def main(out: str = "/tmp/sf1") -> None:
    os.makedirs(out, exist_ok=True)

    docs = pd.read_parquet(os.path.join(SRC, "documents.parquet"))
    parts = []
    for r in range(REPLICAS):
        d = docs.copy()
        if r > 0:
            suffix = f" repz{string.ascii_lowercase[r]}"
            d["text"] = d["text"] + suffix
            d["doc_id"] = d["doc_id"] + STRIDE * r
            d["n_chars"] = d["text"].str.len().astype("int64")
        parts.append(d)
    pd.concat(parts, ignore_index=True).to_parquet(
        os.path.join(out, "documents.parquet"), index=False
    )

    ev = pd.read_parquet(os.path.join(SRC, "events.parquet"))
    parts = []
    for r in range(REPLICAS):
        e = ev.copy()
        if r > 0:
            e["event_id"] = e["event_id"] + STRIDE * r
            e["user_id"] = e["user_id"] + STRIDE * r
        parts.append(e)
    pd.concat(parts, ignore_index=True).to_parquet(
        os.path.join(out, "events.parquet"), index=False
    )

    em = pd.read_parquet(os.path.join(SRC, "embeddings.parquet"))
    parts = []
    for r in range(REPLICAS):
        e = em.copy()
        if r > 0:
            e["vec_id"] = e["vec_id"] + STRIDE * r
            e["embedding"] = e["embedding"].map(
                lambda v, rr=r: [float(v[0]) + 0.0017 * rr] + [float(x) for x in v[1:]]
            )
        parts.append(e)
    pd.concat(parts, ignore_index=True).to_parquet(
        os.path.join(out, "embeddings.parquet"), index=False
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
    import pyarrow.parquet as pq

    for t in ("documents", "events", "embeddings"):
        n = pq.ParquetFile(os.path.join(out, f"{t}.parquet")).metadata.num_rows
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    main(outdir)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_fixtures import make_bpe_expected, make_simhash_expected

    make_simhash_expected(outdir)
    make_bpe_expected(outdir)
    make_bpe_expected(outdir, num_merges=128, batch_size=16, suffix="_b16")
