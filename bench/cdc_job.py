"""Standalone CDC pipeline job for spark-submit (scaling-efficiency evidence).

Run the SAME pre-generated event stream end-to-end (read -> validate ->
salted LWW dedup -> MERGE -> snapshot commits) at a given parallelism:

    spark-submit --master local[N] --py-files pkg.zip bench/cdc_job.py \
        --events /path/events_parquet --out /path/workdir --buckets 32

Prints one JSON line: {"cpus": N, "n_events": E, "elapsed_sec": T,
"events_per_sec": E/T}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--cpus", type=int, default=0)
    ap.add_argument("--strategy", default="mor")
    ap.add_argument("--compact-every", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--colocate", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cpus = args.cpus or spark.sparkContext.defaultParallelism

    from icdc_dataloader_spark.repos import make_pipeline

    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    pipe = make_pipeline(
        spark,
        args.out,
        n_buckets=args.buckets,
        strategy=args.strategy,
        compact_every=args.compact_every,
        colocate_deltas=bool(args.colocate),
    )
    events = spark.read.parquet(args.events)
    n_events = events.count()

    if args.warmup:
        # JIT/codegen warmup on a small slice through a throwaway table:
        # measures steady-state throughput, not JVM cold start (disclosed in
        # BENCH/BASELINE.md).  Same code paths: annotate, dedup, append.
        from pyspark.sql import functions as F

        wpipe = make_pipeline(
            spark,
            args.out + "_warmup",
            n_buckets=args.buckets,
            strategy=args.strategy,
            compact_every=1,
        )
        warm = events.limit(50_000).withColumn(
            "batch_id", F.col("batch_id") * 0
        )
        wpipe.run(warm)
        shutil.rmtree(args.out + "_warmup", ignore_errors=True)

    from icdc_dataloader_spark import timers

    timers.reset()
    t0 = time.time()
    pipe.run(events)
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_events": n_events,
                "elapsed_sec": round(elapsed, 3),
                "events_per_sec": round(n_events / elapsed, 1),
                "phases": timers.snapshot(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
