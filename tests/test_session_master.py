"""Master resolution must never downgrade a cluster job to local mode:
a spark-submit-provided master is inherited unless cores are explicit."""

import ccnet_spark_spark.session as session


def test_inherits_submitted_master(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    master, n = session._resolve_master(None, submitted_has_master=True)
    assert master is None and n is None  # inherit — do not call .master()


def test_explicit_cores_override_submitted_master(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    master, n = session._resolve_master(8, submitted_has_master=True)
    assert master == "local[8]" and n == 8


def test_env_cores_used_when_no_master(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")
    master, n = session._resolve_master(None, submitted_has_master=False)
    assert master == "local[4]" and n == 4


def test_default_local_star(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    master, n = session._resolve_master(None, submitted_has_master=False)
    assert master == "local[*]" and n and n >= 1
