"""F2(e): mid-stream schema evolution — a new column appears between
batches (model v2), later widened — with no data rewrite and continued
sha256 parity (north rule: add/widen columns without rewrite)."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from icdc_dataloader_spark.plans.merge import read_state, table_schema
from icdc_dataloader_spark.repos import make_pipeline, repos_payload_schema
from icdc_dataloader_spark.sources.gen import gen_events_pandas


def test_mid_stream_evolution(spark, tmp_path):
    pdf = gen_events_pandas(
        n_events=2000, n_repos=15, n_paths=5, seed=90, n_batches=4, p_delete=0.05
    )
    p = str(tmp_path / "events.parquet")
    pdf.to_parquet(p, index=False)
    events = spark.read.parquet(p)

    pipe = make_pipeline(spark, str(tmp_path / "out"), n_buckets=4, strategy="mor",
                         compact_every=100)
    pipe.run(events, max_batches=2)
    files_before = {f["path"] for f in pipe.lake.snapshot()["files"]}

    # model v2: add stars:long (metadata-only commit)
    p2 = repos_payload_schema().add("stars", T.LongType())
    pipe.lake.evolve_schema(table_schema(p2))
    assert {f["path"] for f in pipe.lake.snapshot()["files"]} == files_before

    # remaining batches carry the new column
    with_stars = events.filter(F.col("batch_id") >= 2).withColumn(
        "stars", F.col("seq") % 100
    )
    pipe.run(with_stars)

    state = read_state(spark, pipe.lake)
    assert "stars" in state.columns
    rows = state.collect()
    assert any(r["stars"] is not None for r in rows)      # new data has stars
    # rows last touched before the evolution read back as NULL, no rewrite
    assert any(r["stars"] is None for r in rows)

    # widen stars -> double, still no rewrite, old values readable
    p3 = repos_payload_schema().add("stars", T.DoubleType())
    pipe.lake.evolve_schema(table_schema(p3))
    state2 = read_state(spark, pipe.lake)
    vals = [r["stars"] for r in state2.collect() if r["stars"] is not None]
    assert vals and all(isinstance(v, float) for v in vals)


def test_evolution_keeps_sha_parity(spark, tmp_path):
    from icdc_dataloader_spark import oracle

    pdf = gen_events_pandas(
        n_events=1500, n_repos=10, n_paths=5, seed=91, n_batches=3, p_delete=0.1
    )
    p = str(tmp_path / "ev.parquet")
    pdf.to_parquet(p, index=False)
    events = spark.read.parquet(p)
    pipe = make_pipeline(spark, str(tmp_path / "out"), n_buckets=4, strategy="mor",
                         compact_every=2)
    pipe.run(events, max_batches=1)
    pipe.lake.evolve_schema(
        table_schema(repos_payload_schema().add("stars", T.LongType()))
    )
    pipe.run(events)

    got = {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in read_state(spark, pipe.lake).collect()
    }
    out = oracle.replay(pdf.to_dict("records"))
    exp = {
        k: r["content_sha256"]
        for k, r in out["state"].items()
        if r["_op"] != "delete"
    }
    assert got == exp
