"""Two-parallelism scaling measurement (BASELINE.json criterion, sandbox
form: same job, same input, local[N] vs local[4N]).

Methodology: the host is SHARED and bursty (load swings of 10+ between
minutes), so the two levels are INTERLEAVED — each round launches one fresh
JVM per level back-to-back (A, B, A, B, ...) and every JVM does one un-timed
warmup pass (JIT + Python-worker spin-up + page cache — a 10^12-scale
production job amortizes these to zero) before its timed pass. Levels never
overlap (concurrent Spark jobs on one box corrupt the measurement). Report
min AND median per level: min-based efficiency is the contention-robust
read (both minima approximate the quiet-host run), medians show the noise.

Usage: python tools/bench_scaling.py [n_rows] [rounds] [levels e.g. 4,16]
                                    [--curated]
--curated runs the full DataComp cascade (metadata gates -> caption
budget -> model gates incl. the image-decode tower) instead of the plain
caption pipeline — the decode-bearing scaling read.
--fused additionally switches the cascade's model-gate stage to the
zero-shuffle fused passthrough (model_gates_mode="fused") for the
join-vs-fused scaling A/B.
Writes JSON lines to stdout; summary table at the end.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

CURATED = "--curated" in sys.argv
FUSED = "--fused" in sys.argv
_args = [a for a in sys.argv[1:] if not a.startswith("--")]
N_ROWS = int(_args[0]) if len(_args) > 0 else 240_000
ROUNDS = int(_args[1]) if len(_args) > 1 else 3
LEVELS = [int(x) for x in (_args[2] if len(_args) > 2 else "4,16").split(",")]

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, ".")
from ccnet_spark_spark.session import get_spark
import pyspark.sql.functions as F
from ccnet_spark_spark.plans.pipeline import Pipeline, Config
from ccnet_spark_spark.operators.bucket import load_cutoffs_dict
from ccnet_spark_spark.sources.tables import write_result
from ccnet_spark_spark.synth import write_pairs

cpus = int(sys.argv[1]); n_rows = int(sys.argv[2]); curated = sys.argv[3] == "1"
fused = sys.argv[4] == "1"
spark = get_spark(app_name=f"scaling{cpus}", cores=cpus)
pairs_path = f"/tmp/ccnet_scaling_pairs_n{n_rows}_p64"
if not os.path.exists(os.path.join(pairs_path, "_SUCCESS")):
    # 64 files regardless of WHICH level generates first: fewer files than
    # the largest level's cores would cap its scan parallelism and corrupt
    # the scaling read (measured: 8-file input capped local[16] at 0.75
    # efficiency; 64-file input restored the same plan to >0.8)
    write_pairs(spark, pairs_path, n_rows, partitions=64)
if curated:
    cfg = Config(cutoffs=load_cutoffs_dict(), image_gates=True, caption_budget=10,
                 model_gates=True,
                 model_gates_mode="fused" if fused else "join")
else:
    cfg = Config(cutoffs=load_cutoffs_dict())

def one_pass(tag):
    t0 = time.time()
    # verdict/scrub label table: payload bytes are never rewritten at scale
    out = Pipeline(spark, cfg).run(spark.read.parquet(pairs_path)).drop("bytes")
    write_result(out.withColumn("lang", F.coalesce("lang", F.lit("__null__"))),
                 f"/tmp/ccnet_scaling_out_{cpus}_{tag}")
    return time.time() - t0

one_pass("warmup")  # untimed
print(json.dumps({"cpus": cpus, "n_rows": n_rows, "curated": curated, "fused": fused,
                  "sec": round(one_pass("timed"), 2)}))
spark.stop()
"""


def run_child(cpus: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(N_ROWS), "1" if CURATED else "0",
         "1" if FUSED else "0"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stderr[-2000:])
        raise RuntimeError(
            f"scaling child local[{cpus}] failed (rc={out.returncode}, "
            f"{'no JSON line' if not lines else 'nonzero exit'}) — stderr above"
        )
    print(lines[-1], flush=True)
    return json.loads(lines[-1])["sec"]


def main():
    times: dict[int, list[float]] = {c: [] for c in LEVELS}
    for _round in range(ROUNDS):
        for cpus in LEVELS:  # interleave: A, B within every round
            times[cpus].append(run_child(cpus))
    print()
    print("| cores | min sec | median sec | images/sec (min) |")
    print("|---|---|---|---|")
    for cpus in LEVELS:
        mn, md = min(times[cpus]), statistics.median(times[cpus])
        print(f"| local[{cpus}] | {mn:.1f} | {md:.1f} | {N_ROWS/mn:,.0f} |")
    for a in LEVELS:
        for b in LEVELS:
            if b > a:
                for tag, f in (("min", min), ("median", statistics.median)):
                    speedup = f(times[a]) / f(times[b])
                    eff = speedup / (b / a)
                    print(
                        f"scaling {a}->{b} ({tag}): speedup {speedup:.2f}x "
                        f"of {b / a:.0f}x ideal, efficiency {eff:.2f}"
                    )


if __name__ == "__main__":
    main()
