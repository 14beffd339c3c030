"""Two-parallelism scaling measurement (BASELINE.json criterion, sandbox
form: same job, same input, local[N] vs local[4N]).

Methodology: one JVM per parallelism level; one un-timed warmup pass
(JIT + Python-worker spin-up + page cache — a 10^12-scale production job
amortizes these to zero), then `reps` timed passes of the full pipeline
(read -> transform -> partitioned write). Levels run strictly serially —
overlapping Spark jobs on one box corrupt the measurement.

Usage: python tools/bench_scaling.py [n_rows] [reps]
Writes JSON lines to stdout; summary table at the end.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
LEVELS = [2, 8, 32]

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, ".")
from ccnet_spark_spark.session import get_spark
import pyspark.sql.functions as F
from ccnet_spark_spark.plans.pipeline import Pipeline, Config
from ccnet_spark_spark.operators.bucket import load_cutoffs_dict
from ccnet_spark_spark.sources.tables import write_result
from ccnet_spark_spark.synth import write_pairs

cpus = int(sys.argv[1]); n_rows = int(sys.argv[2]); reps = int(sys.argv[3])
spark = get_spark(app_name=f"scaling{cpus}", cores=cpus)
pairs_path = f"/tmp/ccnet_scaling_pairs_n{n_rows}"
if not os.path.exists(os.path.join(pairs_path, "_SUCCESS")):
    write_pairs(spark, pairs_path, n_rows)
cfg = Config(cutoffs=load_cutoffs_dict())

def one_pass(tag):
    t0 = time.time()
    # verdict/scrub label table: payload bytes are never rewritten at scale
    out = Pipeline(spark, cfg).run(spark.read.parquet(pairs_path)).drop("bytes")
    write_result(out.withColumn("lang", F.coalesce("lang", F.lit("__null__"))),
                 f"/tmp/ccnet_scaling_out_{cpus}_{tag}")
    return time.time() - t0

one_pass("warmup")  # untimed
times = [one_pass(i) for i in range(reps)]
print(json.dumps({"cpus": cpus, "n_rows": n_rows, "times": [round(t,1) for t in times]}))
spark.stop()
"""


def main():
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(cpus), str(N_ROWS), str(REPS)],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        print(line)
        rec = json.loads(line)
        results[cpus] = statistics.median(rec["times"])
    print()
    print(f"| cores | median sec | images/sec |")
    print(f"|---|---|---|")
    for cpus, sec in results.items():
        print(f"| local[{cpus}] | {sec:.1f} | {N_ROWS/sec:,.0f} |")
    for a, b in [(2, 8), (8, 32)]:
        if a in results and b in results:
            speedup = results[a] / results[b]
            eff = speedup / (b / a)
            print(f"scaling {a}->{b}: speedup {speedup:.2f}x of {b//a}x ideal, efficiency {eff:.2f}")


if __name__ == "__main__":
    main()
