"""Extreme-skew LWW dedup bench (round-3 VERDICT #5).

Generates a Zipf(s=1.5) change stream — P(rank r) ∝ r^-1.5 via the
inverse-CDF power-law sampler, so the hottest key carries ~29% of ALL
rows — and times the three lww_dedup plans (salted / agg / window) on
identical input, forcing full-payload materialization (xxhash64 over
every column) so column pruning can't favor a plan.

Also reports the structural skew numbers that explain the wall times:
max rows any single task must sort for the window plan (= the hot key's
row count) vs the salted phase-one bound (hot key / salt_buckets).

Protocol: strategies interleaved round-robin ×REPEATS, best-of per
strategy (VM drift).  Run: python bench/skew_bench.py [n_events] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPEATS = 3
STRATEGIES = ["salted", "agg", "window"]


def zipf_events(spark, n_events: int, s: float = 1.5, n_keys: int = 1_000_000,
                payload_repeat: int = 8, n_paths: int = 1,
                partitions: int | None = None):
    """Zipf(s) keyed events: rank r sampled as floor(u^(-1/(s-1))),
    clamped to n_keys (the standard power-law tail sampler; s>1)."""
    df = spark.range(
        0, n_events, 1,
        partitions or spark.sparkContext.defaultParallelism,
    )
    u = (
        F.pmod(F.xxhash64(F.col("id"), F.lit(11)), F.lit(1_000_000)) + 1
    ) / 1_000_000.0
    rank = F.least(
        F.lit(n_keys).cast("long"),
        F.pow(u, F.lit(-1.0 / (s - 1.0))).cast("long"),
    )
    return df.select(
        F.concat(F.lit("r"), rank.cast("string")).alias("repo"),
        F.concat(
            F.lit("p"),
            F.pmod(F.xxhash64("id", F.lit(12)), F.lit(n_paths)).cast("string"),
        ).alias("path"),
        F.col("id").alias("seq"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("commit"),
        F.repeat(
            F.concat(F.lit("payload-"), F.col("id").cast("string"), F.lit(";")),
            payload_repeat,
        ).alias("content"),
    )


def run(n_events: int = 8_000_000, cpus: int = 32) -> dict:
    from icdc_dataloader_spark.operators.dedup import (
        choose_lww_strategy, lww_dedup,
    )
    from icdc_dataloader_spark.session import get_spark

    spark = get_spark("skew_bench", parallelism=cpus, shuffle_partitions=cpus)
    ev = zipf_events(spark, n_events)
    ev.write.mode("overwrite").parquet("/tmp/skew_bench_events")
    ev = spark.read.parquet("/tmp/skew_bench_events")
    cols = ev.columns

    # structural skew: rows the window plan funnels through ONE task
    freq = ev.groupBy("repo", "path").count()
    hot = freq.agg(F.max("count").alias("mx"), F.count("*").alias("nk")).first()

    def force(df):
        # hash every column of every winner: no plan can prune payload
        return str(df.select(
            F.sum(F.xxhash64(F.struct(*cols)).cast("decimal(38,0)")).alias("h")
        ).first()["h"])

    # warm-up (untimed)
    force(lww_dedup(ev.limit(100_000), ["repo", "path"], seq_col="seq",
                    tiebreakers=["commit"], strategy="agg"))

    samples: dict[str, list[float]] = {s: [] for s in STRATEGIES}
    checksums = {}
    for _ in range(REPEATS):
        for strat in STRATEGIES:
            t0 = time.time()
            checksums[strat] = force(
                lww_dedup(ev, ["repo", "path"], seq_col="seq",
                          tiebreakers=["commit"], strategy=strat)
            )
            samples[strat].append(time.time() - t0)

    # naive-window leg: disable InferWindowGroupLimit so the rn=1 window
    # runs as the classic one-reduce-task-per-key sort (the plan 'auto'
    # must never emit) — single shot; its margin dwarfs drift
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    t0 = time.time()
    checksums["window_naive"] = force(
        lww_dedup(ev, ["repo", "path"], seq_col="seq",
                  tiebreakers=["commit"], strategy="window")
    )
    naive_sec = time.time() - t0
    dispatch_rule_off = choose_lww_strategy(ev, ["repo", "path"])
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1000")

    assert len(set(checksums.values())) == 1, checksums  # same winners
    dispatched = choose_lww_strategy(ev, ["repo", "path"])
    out = {
        "n_events": n_events,
        "cpus": cpus,
        "zipf_s": 1.5,
        "hot_key_rows": hot["mx"],
        "hot_key_share": round(hot["mx"] / n_events, 4),
        "n_keys_seen": hot["nk"],
        "wall_sec_best": {s: round(min(v), 3) for s, v in samples.items()},
        "wall_sec_all": {
            s: [round(x, 3) for x in v] for s, v in samples.items()
        },
        "window_naive_sec": round(naive_sec, 3),
        "naive_window_max_task_rows": hot["mx"],
        "salted_phase1_max_task_rows": (hot["mx"] + 63) // 64,
        "auto_dispatch": dispatched,
        "auto_dispatch_rule_off": dispatch_rule_off,
    }
    spark.stop()
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(json.dumps(run(n, cpus)))
