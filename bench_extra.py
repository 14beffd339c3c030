"""Per-query isolation harness (guide §1.4): times each contract query with
the noop sink so the computation is measured without the bench's
count-every-column materialization, captures .explain("formatted") for plan
auditing, and records per-query shuffle read/write bytes from the app status
store so plan regressions are visible even when wall-time is noisy.

NOT the driver bench — bench.py stays frozen. This exists for
OPTIMIZATION_r06.md evidence and plans/r06/ artifacts.

Usage:
  python bench_extra.py --queries jaccard_pairs,dup_clusters --reps 3
  python bench_extra.py --plans plans/r06 --suffix before   # explain only
  python bench_extra.py --all --reps 3 --json /tmp/iso.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _stage_totals(spark):
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all completed
    stages, via the UI REST API (the harness enables the UI for exactly
    this). Best-effort: returns (0, 0) when the UI is off."""
    try:
        import json as _json
        import urllib.request

        app = spark.sparkContext.applicationId
        port = spark.sparkContext.getConf().get("spark.ui.port", "4040")
        stages = _json.load(
            urllib.request.urlopen(
                f"http://localhost:{port}/api/v1/applications/{app}/stages", timeout=5
            )
        )
        rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
        wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        return rd, wr
    except Exception:
        return 0, 0


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--all", action="store_true", help="every bench query")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--plans", default=None, help="dir to write explain() files")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("--skip-time", action="store_true", help="plans only")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from ccnet_spark_spark.session import get_spark

    spark = get_spark(
        app_name="ccnet_bench_extra",
        cores=CPUS,
        extra_conf={"spark.ui.enabled": "true"},  # for the shuffle-byte probe
    )
    entrymod._ensure_pkg(spark)
    qs = entrymod.queries()

    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    else:
        names = list(BENCH_QUERIES)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # one untimed warmup for JIT + Python-worker spin-up
    noop(qs[names[0]](spark, SF_DIR))

    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"iso:{name}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        if args.skip_time:
            continue
        times = []
        rd0, wr0 = _stage_totals(spark)
        for _ in range(args.reps):
            t0 = time.time()
            noop(qs[name](spark, SF_DIR))
            times.append(round(time.time() - t0, 3))
        rd1, wr1 = _stage_totals(spark)
        results[name] = {
            "min": min(times),
            "med": round(statistics.median(times), 3),
            "times": times,
            "shuffle_read_mb": round((rd1 - rd0) / args.reps / 1e6, 2),
            "shuffle_write_mb": round((wr1 - wr0) / args.reps / 1e6, 2),
        }
        print(f"{name}: min={min(times)} med={results[name]['med']} "
              f"shW={results[name]['shuffle_write_mb']}MB times={times}", flush=True)
        spark.sparkContext.setJobDescription(None)

    if args.json and results:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
