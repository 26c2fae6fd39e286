"""Round-6 profiling harness (bench.py stays frozen — guide §1).

Replicates bench.py's methodology leg by leg, adding:

- per-leg wall time AND a noop-sink variant where applicable (§1.4);
- job descriptions so the (disabled-by-default) UI / event logs are
  readable (§1.5);
- `.explain("formatted")` capture for every declared headline query into
  plans/r06/<query>_<tag>.txt;
- CDC phase timers (timers.snapshot()) so the per-batch fixed cost is
  itemized, not guessed;
- the same 32-proc sha256 hardware probe before/between/after, so every
  number is bracketed against VM regime drift.

Usage:
    python bench_extra.py [--tag before|after] [--legs q1,...]
    python bench_extra.py --explain-only --tag before
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# load the frozen bench.py by path (the bench/ package shadows it on import)
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "bench_frozen", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)
HEADLINE, _hw_probe_mhs = _bench.HEADLINE, _bench._hw_probe_mhs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--legs", default="")
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("--skip-cdc", action="store_true")
    ap.add_argument("--cdc-events", type=int, default=0)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_cdc_events = args.cdc_events or int(
        os.environ.get("SPARK_GRAFT_CDC_EVENTS", "2000000")
    )

    from icdc_dataloader_spark import timers
    from icdc_dataloader_spark.queries import QUERIES
    from icdc_dataloader_spark.repos import make_pipeline
    from icdc_dataloader_spark.session import get_spark
    from icdc_dataloader_spark.sources.gen import gen_events_spark

    legs = [s for s in args.legs.split(",") if s] or list(HEADLINE)

    hw_before = None if args.explain_only else _hw_probe_mhs()
    spark = get_spark("bench_extra", parallelism=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    def dump_plan(name, df):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())

    if args.explain_only:
        extra = {}
        from icdc_dataloader_spark.operators.dedup import minhash_lsh_dedup
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        extra["minhash_near_dups_xx64"] = minhash_lsh_dedup(
            docs, jaccard_threshold=0.3, hash_mode="xxhash64"
        )
        from icdc_dataloader_spark.operators import similarity
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        extra["lsh_ann_topk_bench"] = similarity.lsh_topk(
            emb, emb.filter("vec_id < 50"), dim=64, k=10
        )
        for name in legs:
            dump_plan(name, QUERIES[name](spark, sf_dir))
        for name, df in extra.items():
            dump_plan(name, df)
        spark.stop()
        print(json.dumps({"explained": legs + list(extra)}))
        return

    # warm-up: same disclosure as bench.py
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        QUERIES["q1_pricing_summary"](spark, warm_sf).collect()
        QUERIES["lww_latest_event"](spark, warm_sf).collect()

    timings: dict[str, list] = {}
    for _rep in range(args.repeat):
        for name in legs:
            if name not in QUERIES:
                continue
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            timings.setdefault(name, []).append(round(time.time() - t0, 3))
            sc.setJobDescription(None)

    extra_legs = {}
    if "minhash_near_dups_xx64" in legs or args.legs == "":
        from icdc_dataloader_spark.operators.dedup import minhash_lsh_dedup
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        for _rep in range(args.repeat):
            sc.setJobDescription("bench_extra:minhash_near_dups_xx64")
            t0 = time.time()
            minhash_lsh_dedup(
                docs, jaccard_threshold=0.3, hash_mode="xxhash64"
            ).collect()
            extra_legs.setdefault("minhash_near_dups_xx64", []).append(
                round(time.time() - t0, 3))
            sc.setJobDescription(None)

    if "lsh_ann_topk_bench" in legs or args.legs == "":
        from icdc_dataloader_spark.operators import similarity
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
        ann_queries = emb.filter("vec_id < 50")
        for _rep in range(args.repeat):
            sc.setJobDescription("bench_extra:lsh_ann_topk")
            t0 = time.time()
            similarity.lsh_topk(emb, ann_queries, dim=64, k=10).select(
                "query_id", "neighbor_id").collect()
            extra_legs.setdefault("lsh_ann_topk_bench", []).append(
                round(time.time() - t0, 3))
            sc.setJobDescription(None)
        emb.unpersist()

    hw_mid = _hw_probe_mhs() if not args.skip_cdc else None

    cdc = {}
    if not args.skip_cdc:
        workdir = tempfile.mkdtemp(prefix="bench_extra_cdc_")
        try:
            events_path = os.path.join(workdir, "events")
            sc.setJobDescription("bench_extra:cdc_gen")
            gen_events_spark(
                spark, n_cdc_events,
                n_repos=max(1000, n_cdc_events // 100),
                n_batches=4, zipf_k=3.0,
            ).write.mode("overwrite").partitionBy("batch_id").parquet(events_path)
            pipe = make_pipeline(
                spark, os.path.join(workdir, "out"),
                n_buckets=cpus, strategy="mor", compact_every=2,
            )
            events = spark.read.parquet(events_path)
            timers.reset()
            sc.setJobDescription("bench_extra:cdc_pipeline")
            t0 = time.time()
            pipe.run(events)
            cdc_sec = time.time() - t0
            sc.setJobDescription(None)
            cdc = {
                "sec": round(cdc_sec, 3),
                "events_per_sec": round(n_cdc_events / cdc_sec, 1),
                "events": n_cdc_events,
                "phases": timers.snapshot(),
            }
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    out = {
        "tag": args.tag,
        "sf_dir": sf_dir,
        "cpus": cpus,
        "queries": timings,
        "extra": extra_legs,
        "cdc": cdc,
        "hw_probe_mhs": {"before": hw_before, "mid": hw_mid},
    }
    spark.stop()
    out["hw_probe_mhs"]["after"] = _hw_probe_mhs()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
