"""N->4N scaling measurement for the TRAINER path (ridge quality probe).

Same methodology as tools/bench_scaling.py (fresh JVM per leg, untimed
warmup, levels interleaved, min + median reported): times ONE probe
train — integer feature projection (JVM) + per-partition [y|X]'[y|X]
int64 Gram partials (one vectorized numpy matmul per Arrow batch) +
driver-side solve — over the cached 64-file pairs table. The label is a
cheap surface rule so the measurement isolates the trainer, not the
pp-labeling UDF.

Usage: python tools/bench_train_scaling.py [n_rows] [rounds] [levels]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
N_ROWS = int(_args[0]) if len(_args) > 0 else 480_000
ROUNDS = int(_args[1]) if len(_args) > 1 else 3
LEVELS = [int(x) for x in (_args[2] if len(_args) > 2 else "8,32").split(",")]
if len(LEVELS) != 2:
    raise SystemExit(f"levels must be exactly two (N,4N), got {LEVELS}")

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, ".")
from ccnet_spark_spark.session import get_spark
import pyspark.sql.functions as F
from ccnet_spark_spark.operators import probe
from ccnet_spark_spark.synth import write_pairs

cpus = int(sys.argv[1]); n_rows = int(sys.argv[2])
spark = get_spark(app_name=f"train_scaling{cpus}", cores=cpus)
pairs_path = f"/tmp/ccnet_scaling_pairs_n{n_rows}_p64"
if not os.path.exists(os.path.join(pairs_path, "_SUCCESS")):
    write_pairs(spark, pairs_path, n_rows, partitions=64)
LANGS = ("de", "en", "es", "fr", "zh")

def one_pass():
    df = (
        spark.read.parquet(pairs_path)
        .select(F.col("caption").alias("text"), F.lit("en").alias("lang"))
        .withColumn("label", F.when(F.length("text") >= 600, F.lit(1)).otherwise(F.lit(0)))
    )
    t0 = time.time()
    w = probe.train_ridge(df, "label", langs=LANGS)
    return time.time() - t0, w[0]

one_pass()  # untimed warmup (JIT + python worker spin-up)
sec, w0 = one_pass()
print(json.dumps({"cpus": cpus, "n_rows": n_rows, "sec": round(sec, 2), "w0": w0}))
spark.stop()
"""


def run_child(cpus: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(N_ROWS)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stderr[-2000:])
        raise RuntimeError(f"child local[{cpus}] failed")
    rec = json.loads(lines[-1])
    print(json.dumps(rec), flush=True)
    return rec["sec"]


def main() -> None:
    times: dict[int, list[float]] = {lv: [] for lv in LEVELS}
    for _ in range(ROUNDS):
        for lv in LEVELS:  # interleaved A/B per round
            times[lv].append(run_child(lv))
    lo, hi = LEVELS
    emin = times[lo] and min(times[lo]) / min(times[hi]) / (hi / lo)
    emed = statistics.median(times[lo]) / statistics.median(times[hi]) / (hi / lo)
    print(
        json.dumps(
            {
                "n_rows": N_ROWS,
                "levels": LEVELS,
                "times": times,
                "eff_min": round(emin, 3),
                "eff_median": round(emed, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
