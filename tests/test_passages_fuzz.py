"""Randomized cross-validation of the passage operators against an
INDEPENDENT pure-Python reference (same style as the fixture oracles:
re-derive the whole algorithm — gram counting, position marking, interval
merge, trimming — from the definition, share nothing with the Spark
implementation). Seeded corpora with planted copies, partial overlaps,
short docs and empty docs."""

import random
import re
from collections import defaultdict

import pytest

from ccnet_spark_spark.operators import passages

N = 4  # anchor gram size for the fuzz


def _ref_tokens(text):
    # mirrors Spark split(lower(trim(text)), '\s+'): '' yields one empty token
    return re.split(r"\s+", text.strip().lower())


def ref_spans(docs: dict, n: int = N, min_occ: int = 2):
    positions = defaultdict(list)
    toks = {d: _ref_tokens(t) for d, t in docs.items()}
    for d, tk in toks.items():
        for p in range(len(tk) - n + 1):
            positions[" ".join(tk[p : p + n])].append((d, p))
    dup_pos = defaultdict(set)
    for ps in positions.values():
        if len(ps) >= min_occ:
            for d, p in ps:
                dup_pos[d].add(p)
    out = set()
    for d, ps in dup_pos.items():
        cur = None
        for p in sorted(ps):
            end = p + n - 1
            if cur and p <= cur[1] + 1:
                cur = (cur[0], max(cur[1], end))
            else:
                if cur:
                    out.add((d, cur[0], cur[1], cur[1] - cur[0] + 1))
                cur = (p, end)
        if cur:
            out.add((d, cur[0], cur[1], cur[1] - cur[0] + 1))
    return out


def ref_trim(docs: dict, n: int = N):
    spans = ref_spans(docs, n)
    covered = defaultdict(set)
    for d, s, e, _l in spans:
        covered[d].update(range(s, e + 1))
    out = {}
    for d, t in docs.items():
        orig = re.split(r"\s+", t.strip())
        kept = [tok for i, tok in enumerate(orig) if i not in covered[d]]
        out[d] = (" ".join(kept), len(kept), len(orig) - len(kept))
    return out


def make_corpus(seed: int) -> dict:
    rng = random.Random(seed)
    vocab = [f"w{chr(ord('a') + i)}{chr(ord('a') + j)}" for i in range(5) for j in range(4)]
    docs = {}
    for i in range(rng.randint(4, 12)):
        docs[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
    # planted full copy, partial copy, and self-repetition
    base = docs[0]
    docs[100] = base
    toks = base.split()
    if len(toks) >= 6:
        docs[101] = " ".join(toks[:6]) + " zzq zzr " + " ".join(rng.choice(vocab) for _ in range(5))
    docs[102] = " ".join(toks[:5]) + " " + " ".join(toks[:5])
    return docs


@pytest.mark.parametrize("seed", range(8))
def test_passage_spans_and_trim_match_reference(spark, seed):
    docs = make_corpus(seed)
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["start_tok"], r["end_tok"], r["dup_tokens"])
        for r in passages.duplicate_passage_spans(df, gram_n=N).collect()
    }
    assert got == ref_spans(docs), f"seed={seed}"
    want_trim = ref_trim(docs)
    got_trim = {
        r["doc_id"]: (r["trimmed_text"], r["kept_tokens"], r["removed_tokens"])
        for r in passages.trim_duplicate_passages(df, gram_n=N).collect()
    }
    assert got_trim == want_trim, f"seed={seed}"
