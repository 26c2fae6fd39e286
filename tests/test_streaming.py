"""Structured Streaming front-end: file-source tail -> foreachBatch apply,
exactly-once across restart via batch-id no-ops."""

import os

from icdc_dataloader_spark import oracle
from icdc_dataloader_spark.plans.merge import read_state
from icdc_dataloader_spark.repos import make_pipeline
from icdc_dataloader_spark.sources.gen import gen_events_pandas
from icdc_dataloader_spark.streaming.stream import run_file_stream


def test_file_stream_end_to_end(spark, tmp_path):
    src = tmp_path / "stream_in"
    os.makedirs(src)
    pdf = gen_events_pandas(
        n_events=1500, n_repos=12, n_paths=4, seed=101, n_batches=3, p_delete=0.1,
        p_new=0.0,  # NEW-mode outcomes are apply-order-dependent by definition
    )
    # one file per batch arriving in the source dir
    for bid, grp in pdf.groupby("batch_id"):
        grp.to_parquet(str(src / f"events-{bid}.parquet"), index=False)

    pipe = make_pipeline(spark, str(tmp_path / "out"), n_buckets=4, strategy="mor",
                         compact_every=100)
    run_file_stream(
        spark, pipe, str(src), str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    applied = pipe.lake.committed_batch_ids()
    assert len(applied) >= 1 and all(b.startswith("epoch-") for b in applied)

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

    # restart with the same checkpoint: nothing new -> no state change
    v1 = pipe.lake.latest_version()
    run_file_stream(spark, pipe, str(src), str(tmp_path / "ckpt"))
    assert pipe.lake.latest_version() == v1

    # new file arrives -> picked up on the next drain
    extra = gen_events_pandas(
        n_events=200, n_repos=12, n_paths=4, seed=202, n_batches=1, p_new=0.0
    )
    extra["seq"] = extra["seq"] + 10_000  # later seqs win
    extra.to_parquet(str(src / "events-late.parquet"), index=False)
    run_file_stream(spark, pipe, str(src), str(tmp_path / "ckpt"))
    assert pipe.lake.latest_version() > v1
