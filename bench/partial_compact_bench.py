"""Bucket-targeted vs full compaction (round-4 scale fix, measured).

Scenario 100 TB cares about: a big compacted base, then an incremental
drain that touches a tiny key range (one hot repo).  The old in-loop
compaction rewrote EVERY bucket; the targeted one rewrites only the
delta-bearing ones.  Build pairs of identical tables and time both
compaction flavors in alternating order ×ROUNDS (VM-drift protocol).

Run: python bench/partial_compact_bench.py [n_events] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ROUNDS = 3
N_BUCKETS = 32


def run(n_events: int = 2_000_000, cpus: int = 32) -> dict:
    from icdc_dataloader_spark.plans.merge import compact, read_state
    from icdc_dataloader_spark.repos import make_pipeline
    from icdc_dataloader_spark.session import get_spark
    from icdc_dataloader_spark.sources.gen import gen_events_spark

    spark = get_spark("partial_compact", parallelism=cpus,
                      shuffle_partitions=cpus)
    root = tempfile.mkdtemp(prefix="partial_compact_")
    try:
        base_src = os.path.join(root, "base")
        gen_events_spark(
            spark, n_events, n_repos=max(1000, n_events // 200),
            n_batches=1, seed=3,
        ).write.partitionBy("batch_id").parquet(base_src)
        # incremental drain: ONE repo's keys only (lands in 1-2 buckets)
        inc_src = os.path.join(root, "inc")
        # a handful of keys: buckets hash (repo, path), so the touched
        # bucket count is bounded by the key count, not the event count
        (
            gen_events_spark(spark, 20_000, n_repos=2, n_paths=2,
                             n_batches=1, seed=4)
            .withColumn("batch_id", F.lit(1))
            .write.partitionBy("batch_id").parquet(inc_src)
        )

        def build(name):
            pipe = make_pipeline(
                spark, os.path.join(root, name), n_buckets=N_BUCKETS,
                strategy="mor", compact_every=10**9,
            )
            pipe.run(spark.read.parquet(base_src))
            compact(spark, pipe.lake)               # clean all-base
            pipe.run(spark.read.parquet(inc_src))   # small delta drain
            return pipe

        samples = {"full": [], "targeted": []}
        rows = {}
        for r in range(ROUNDS):
            for mode in (("full", "targeted") if r % 2 == 0
                         else ("targeted", "full")):
                pipe = build(f"t_{mode}_{r}")
                touched = {f["bucket"] for f in pipe.lake.delta_files()}
                t0 = time.time()
                if mode == "full":
                    compact(spark, pipe.lake)
                else:
                    compact(spark, pipe.lake, min_delta_files=1)
                samples[mode].append(time.time() - t0)
                rows[mode] = read_state(spark, pipe.lake).count()
                shutil.rmtree(os.path.join(root, f"t_{mode}_{r}"),
                              ignore_errors=True)
        assert rows["full"] == rows["targeted"], rows
        out = {
            "n_events": n_events,
            "cpus": cpus,
            "n_buckets": N_BUCKETS,
            "delta_buckets_touched": sorted(touched),
            "compact_sec_best": {
                k: round(min(v), 3) for k, v in samples.items()
            },
            "compact_sec_all": {
                k: [round(x, 3) for x in v] for k, v in samples.items()
            },
            "speedup": round(min(samples["full"]) /
                             min(samples["targeted"]), 2),
            "state_rows": rows["full"],
        }
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(json.dumps(run(n, cpus)))
