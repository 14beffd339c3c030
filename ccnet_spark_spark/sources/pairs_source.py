"""Custom Spark 4 Python DataSource for the pair corpus — the engine's
native mapping of the reference's ingestion SOURCE (S1: the HTTP segment
downloader, /root/reference/pipe_load.py — a custom source that fetches
and parses partitioned raw data into rows).

Spark 4's pyspark.sql.datasource API lets a Python class BE a first-class
`spark.read.format(...)` source: Catalyst sees a real relation with an
explicit schema, partition planning happens on the driver (one
InputPartition per row range — the analogue of one partition per WET
segment), and each executor materializes only its partition's rows.
Swapping the deterministic generator for an HTTP fetch + WARC parse
inside `read()` reproduces the reference's ingestion exactly — partition
= segment, row = document — without touching anything downstream.

Usage:
    spark.dataSource.register(PairsDataSource)
    df = (spark.read.format("ccnet_pairs")
          .option("n", 400).option("partitions", 8).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from ..schema import PAIRS_SCHEMA


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class PairsDataSource(DataSource):
    """Options: n (rows, default 400), partitions (default 8), seed."""

    @classmethod
    def name(cls) -> str:
        return "ccnet_pairs"

    def schema(self):
        return PAIRS_SCHEMA

    def reader(self, schema) -> "PairsReader":
        return PairsReader(self.options)

    def simpleStreamReader(self, schema) -> "PairsStreamReader":
        return PairsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "StagedParquetWriter":
        return StagedParquetWriter(self.options, schema, overwrite)


class _FileCommit(WriterCommitMessage):
    def __init__(self, staged: str):
        self.staged = staged


class StagedParquetWriter(DataSourceWriter):
    """Custom SINK with a real two-phase commit — the writer half of the
    DataSource API (the reference's S6/S7 sinks as a registered format):
    each task writes its partition to a STAGING file and returns the path
    as its commit message; commit() — which runs exactly once on the
    driver with every task's message — moves the staged files into the
    target directory and drops a _SUCCESS marker; abort() discards the
    staging area, so readers never observe a half-written result. The
    same protocol every production table format implements (parquet
    committer / Iceberg snapshot commit), here visible end-to-end."""

    def __init__(self, options, schema, overwrite: bool):
        import os
        import uuid

        path = options.get("path")
        if not path:
            raise ValueError("ccnet_pairs writer requires .option('path', ...)")
        self.path = path
        self.names = schema.names
        self.overwrite = overwrite
        # per-WRITE staging dir (uuid minted on the driver, rides the
        # pickled writer instance to every task): two concurrent writes to
        # the same target path stage into disjoint dirs, so one job's
        # commit/abort cleanup can never delete the other's staged files
        self.staging = os.path.join(path, f"_staging-{uuid.uuid4().hex}")

    def write(self, iterator) -> _FileCommit:
        import os
        import uuid

        import pandas as pd

        rows = list(iterator)
        if not rows:
            # an empty pandas frame would be written with null-typed columns
            # (object dtype with no values), poisoning schema merge on read —
            # empty partitions contribute no file
            return _FileCommit("")
        os.makedirs(self.staging, exist_ok=True)
        staged = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.parquet")
        pd.DataFrame(rows, columns=self.names).to_parquet(staged, index=False)
        return _FileCommit(staged)

    def commit(self, messages) -> None:
        import os
        import shutil

        # a fully-empty write stages nothing, so the target dir may not
        # exist yet — the commit still has to publish _SUCCESS into it
        os.makedirs(self.path, exist_ok=True)
        # fault-injection point (crash-recovery tests): the commit planner
        # runs in a separate Python worker process, so tests inject the
        # "died after staging, before publishing" failure through the
        # filesystem — the marker is consumed so exactly ONE attempt dies
        crash = os.path.join(self.path, "_FAULT_CRASH_COMMIT")
        if os.path.exists(crash):
            os.rename(crash, os.path.join(self.path, "_FAULT_CRASH_DONE"))
            raise RuntimeError("injected fault: crashed between staging and commit")
        # overwrite semantics: snapshot the pre-existing data files BEFORE
        # publishing, publish the new ones, then drop the old set — readers
        # see old-complete, mixed-for-an-instant-at-file-granularity, or
        # new-complete, and a crash after publish leaves a superset that the
        # next overwrite clears (append mode skips the delete entirely)
        old = (
            [
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".parquet")
            ]
            if self.overwrite
            else []
        )
        for m in messages:
            if m.staged:  # empty partitions staged nothing
                os.rename(m.staged, os.path.join(self.path, os.path.basename(m.staged)))
        for f in old:
            os.remove(f)
        shutil.rmtree(self.staging, ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        import shutil

        # only THIS write's staging dir — a concurrent write to the same
        # path keeps its own staged files
        shutil.rmtree(self.staging, ignore_errors=True)


class PairsStreamReader(SimpleDataSourceStreamReader):
    """STREAMING ingestion from the same source — the reference's
    continuous segment feed as a Structured Streaming source: the offset
    is the next unread row index, each micro-batch advances it by
    rows_per_batch, and a bounded `n` makes the stream drain under
    Trigger.AvailableNow (offsets stop advancing at n). Exactly-once comes
    from the offset log: replaying a batch re-yields the same deterministic
    rows. Options: n (total rows), rows_per_batch, seed."""

    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.per_batch = max(1, int(options.get("rows_per_batch", 25)))
        self.seed = int(options.get("seed", 0) or 0) or None

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        from ccnet_spark_spark.synth import DEFAULT_SEED, gen_row

        pos = int(start["pos"])
        end = min(pos + self.per_batch, self.n)
        seed = self.seed or DEFAULT_SEED
        rows = [
            (
                r["image_id"],
                r["bytes"],
                r["w"],
                r["h"],
                r["fmt"],
                r["caption"],
                r["phash"],
            )
            for r in (gen_row(i, seed) for i in range(pos, end))
        ]
        return iter(rows), {"pos": end}

    def readBetweenOffsets(self, start, end):
        # replay path (failure recovery): regenerate the exact row range
        rows, _ = PairsStreamReader.read(
            _FixedRange(self, int(start["pos"]), int(end["pos"])), start
        )
        return rows

    def commit(self, end):
        pass


class _FixedRange:
    """Adapter so readBetweenOffsets reuses read() with a pinned end."""

    def __init__(self, src: PairsStreamReader, start: int, end: int):
        self.n = end
        self.per_batch = max(1, end - start)
        self.seed = src.seed


class PairsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 400))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 0) or 0) or None

    def partitions(self):
        if self.n <= 0:
            # empty relation still needs one (empty) partition — range step 0
            # would raise, and Spark expects >= 1 InputPartition
            return [RangePartition(0, 0, self.seed or 0)]
        per = -(-self.n // self.n_parts)
        return [
            RangePartition(lo, min(lo + per, self.n), self.seed or 0)
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: RangePartition):
        # import inside read(): executes on the executor worker
        from ccnet_spark_spark.synth import DEFAULT_SEED, gen_row

        seed = partition.seed or DEFAULT_SEED
        for i in range(partition.start, partition.end):
            r = gen_row(i, seed)
            yield (
                r["image_id"],
                r["bytes"],
                r["w"],
                r["h"],
                r["fmt"],
                r["caption"],
                r["phash"],
            )
