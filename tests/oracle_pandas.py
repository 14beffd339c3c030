"""Single-node pandas oracle: an obviously-correct re-implementation of the
full pipeline semantics (SURVEY.md §5 'reference oracle'), sharing the
*stub models and normalizer/scrub functions verbatim* with the engine but
re-deriving all dataflow (explode/dedup/regroup/verdict) independently in
plain Python. tests/test_pipeline_oracle.py compares the Spark engine
against this row by row."""

from __future__ import annotations

import pandas as pd

from ccnet_spark_spark.functions.normalize import normalize_for_dedup_py
from ccnet_spark_spark.functions.hashing import line_hash_py
from ccnet_spark_spark.functions.scrub import scrub_py
from ccnet_spark_spark.models import (
    stub_perplexity_one,
    stub_predict_lang,
    stub_tokenize_one,
    VOCAB,
)


def run_oracle(
    pairs: pd.DataFrame,
    min_len: int = 300,
    dedup_variant: str = "keep",
    cutoffs: dict[str, tuple[float, float]] | None = None,
    selected_langs: list[str] | None = None,
) -> pd.DataFrame:
    rows = []
    # --- per-doc basics ---
    for _, r in pairs.iterrows():
        caption = r["caption"]
        rows.append(
            {
                "image_id": r["image_id"],
                "caption": caption,
                "original_length": len(caption),
                "original_nlines": caption.count("\n") + 1,
                "too_short": len(caption) < min_len,
            }
        )
    docs = pd.DataFrame(rows)

    # --- global line-level dedup over non-short docs ---
    line_records = []  # (hash, image_id, line_id, line)
    for _, r in docs[~docs.too_short].iterrows():
        for line_id, line in enumerate(r["caption"].split("\n")):
            h = line_hash_py(normalize_for_dedup_py(line))
            line_records.append((h, r["image_id"], line_id, line))

    surviving: dict[str, list[tuple[int, str]]] = {}
    if dedup_variant == "keep":
        keeper: dict[str, tuple[str, int, str]] = {}
        for h, img, lid, line in line_records:
            if h not in keeper or (img, lid) < (keeper[h][0], keeper[h][1]):
                keeper[h] = (img, lid, line)
        for img, lid, line in keeper.values():
            surviving.setdefault(img, []).append((lid, line))
    else:  # nokeep: drop all copies of repeated hashes
        counts: dict[str, int] = {}
        for h, *_ in line_records:
            counts[h] = counts.get(h, 0) + 1
        for h, img, lid, line in line_records:
            if counts[h] == 1:
                surviving.setdefault(img, []).append((lid, line))

    # --- regroup + model stages ---
    out_rows = []
    for _, d in docs.iterrows():
        rec = dict(d)
        kept = sorted(surviving.get(d["image_id"], []))
        if kept:
            rec["dedup_caption"] = "\n".join(line for _, line in kept)
            rec["line_ids_kept"] = [lid for lid, _ in kept]
            rec["nlines"] = len(kept)
            rec["length"] = len(rec["dedup_caption"])
        else:
            rec["dedup_caption"] = None
            rec["line_ids_kept"] = None
            rec["nlines"] = None
            rec["length"] = None
        out_rows.append(rec)
    out = pd.DataFrame(out_rows)

    has_text = out["dedup_caption"].notna()
    lid_res = stub_predict_lang(out.loc[has_text, "dedup_caption"])
    out["lang"] = None
    out["score"] = None
    out.loc[has_text, "lang"] = lid_res["lang"].to_numpy()
    out.loc[has_text, "score"] = lid_res["score"].to_numpy()

    def pp_of(row):
        if row["lang"] in VOCAB and row["dedup_caption"] is not None:
            return stub_perplexity_one(stub_tokenize_one(row["dedup_caption"]))
        return None

    out["perplexity"] = out.apply(pp_of, axis=1)

    cutoffs = cutoffs or {}

    def bucket_of(row):
        pp, lang = row["perplexity"], row["lang"]
        if pp is None or pp < 0 or lang not in cutoffs:
            return "all"
        head, tail = cutoffs[lang]
        if pp < head:
            return "head"
        if pp < tail:
            return "middle"
        return "tail"

    out["bucket"] = out.apply(bucket_of, axis=1)
    out["scrubbed_caption"] = out.apply(
        lambda r: scrub_py(r["dedup_caption"] if r["dedup_caption"] is not None else r["caption"]), axis=1
    )

    def verdict_of(row):
        if row["too_short"]:
            return "too_short"
        if row["dedup_caption"] is None or len(row["dedup_caption"]) == 0:
            return "dup_lines_all"
        if row["lang"] is None:
            return "lid_null"
        if selected_langs and row["lang"] not in selected_langs:
            return "lang_filtered"
        return None

    out["drop_reason"] = out.apply(verdict_of, axis=1)
    out["keep"] = out["drop_reason"].isna()
    return out
