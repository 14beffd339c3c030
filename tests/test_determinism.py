"""Whole-contract determinism guard: every batch query must produce an
IDENTICAL row multiset when re-executed — the property stage retries and
speculative execution rely on (a nondeterministic expression inside a
shuffle can duplicate or lose rows on partial recomputation; rand()-salting
was exactly such a bug in round 1). Streaming queries are excluded (their
tmp-dir workspaces are re-created per call; their determinism is covered by
their arrival-order-invariant oracles)."""

import hashlib

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

STREAMING = {
    "events_window_stream",
    "streaming_dedup",
    "streaming_dedup_ttl",
    "stream_stream_join",
    "foreach_batch_sink",
}


def _result_hash(df) -> str:
    rows = sorted(repr(tuple(r)) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x00")
    return f"{len(rows)}:{h.hexdigest()}"


@pytest.mark.parametrize("name", [n for n in entry.queries() if n not in STREAMING])
def test_query_is_deterministic(spark, name):
    import os

    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata absent")
    fn = entry.queries()[name]
    first = _result_hash(fn(spark, SF_DIR))
    second = _result_hash(fn(spark, SF_DIR))
    assert first == second, f"{name} produced different results on re-execution"
