"""MoR read amplification vs compaction cadence (round-3 VERDICT #2).

``resolve()`` folds the base files plus every outstanding delta batch into
the per-key winner at read time, so read latency grows with un-compacted
deltas; compaction pays a table rewrite to reset that count.  This bench
measures the actual curve so ``compact_every`` is evidenced, not asserted
— the read-path translation of the reference's point-lookup index story
(create_index.py:15-95: it pays index maintenance on write to keep reads
flat; we pay periodic compaction).

Method: drain 16 delta batches into one MoR table WITHOUT in-loop
compaction, then read the FULL resolved state at the snapshot versions
holding 0/2/4/8/16 outstanding deltas (time travel — one table, all
depths coexist, so the depths can be measured INTERLEAVED round-robin
against VM drift, repeats interleaved too).  Also times one full
compaction, giving the amortized write cost per batch at cadence k.

Run: python bench/mor_read_bench.py [n_events] [cpus]
Prints one JSON line; a summary table lands in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTHS = [0, 2, 4, 8, 16]
REPEATS = 3


def run(n_events: int = 2_000_000, cpus: int = 32) -> dict:
    from icdc_dataloader_spark.plans.merge import compact, read_state
    from icdc_dataloader_spark.repos import make_pipeline
    from icdc_dataloader_spark.session import get_spark
    from icdc_dataloader_spark.sources.gen import gen_events_spark

    spark = get_spark(
        "mor_read_bench", parallelism=cpus, shuffle_partitions=cpus
    )
    root = tempfile.mkdtemp(prefix="mor_read_bench_")
    try:
        n_batches = 17  # batch 0 seeds the base; 1..16 become deltas
        binlog = os.path.join(root, "binlog")
        # small key space: the seed batch covers ~all keys, so every depth
        # resolves the SAME state size and the curve isolates delta count
        # (not table growth)
        gen_events_spark(
            spark, n_events, n_repos=500, n_paths=100,
            n_batches=n_batches, seed=7,
        ).write.partitionBy("batch_id").parquet(binlog)
        events = spark.read.parquet(binlog)

        pipe = make_pipeline(
            spark, os.path.join(root, "lake"), n_buckets=cpus,
            strategy="mor", compact_every=10**9,  # no in-loop compaction
        )
        # seed + compact -> a pure-base table, then 16 delta batches
        pipe.run(events, max_batches=1)
        compact(spark, pipe.lake)
        v_by_depth = {0: pipe.lake.latest_version()}
        t0 = time.time()
        res = pipe.run(events)
        drain_sec = time.time() - t0
        assert not res["quarantined"]
        for i, r in enumerate(res["applied"], start=1):
            if i in DEPTHS:
                v_by_depth[i] = r["version"]

        # warm-up read (JVM/codegen; not timed)
        read_state(spark, pipe.lake, version=v_by_depth[0]).count()

        # interleaved: depth order cycles inside each repeat round
        samples: dict[int, list[float]] = {d: [] for d in DEPTHS}
        rows: dict[int, int] = {}
        for _ in range(REPEATS):
            for d in DEPTHS:
                t0 = time.time()
                rows[d] = read_state(
                    spark, pipe.lake, version=v_by_depth[d]
                ).count()
                samples[d].append(time.time() - t0)

        t0 = time.time()
        compact(spark, pipe.lake)
        compact_sec = time.time() - t0
        t0 = time.time()
        rows_after = read_state(spark, pipe.lake).count()
        read_after_compact = time.time() - t0

        out = {
            "n_events": n_events,
            "cpus": cpus,
            "drain_16_batches_sec": round(drain_sec, 3),
            "read_sec_by_deltas": {
                str(d): round(min(s), 3) for d, s in samples.items()
            },
            "read_sec_all_samples": {
                str(d): [round(x, 3) for x in s]
                for d, s in samples.items()
            },
            "rows_by_deltas": {str(d): rows[d] for d in DEPTHS},
            "compact_16_deltas_sec": round(compact_sec, 3),
            "read_after_compact_sec": round(read_after_compact, 3),
            "rows_after_compact": rows_after,
        }
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(json.dumps(run(n, cpus)))
