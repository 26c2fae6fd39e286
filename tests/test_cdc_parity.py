"""End-to-end CDC replay: engine final state == pure-Python oracle, per-row
sha256(content) parity (BASELINE input_hint); resume-from-checkpoint; errors."""

import os

import pytest
from pyspark.sql import functions as F

from icdc_dataloader_spark import oracle
from icdc_dataloader_spark.plans.merge import read_state
from icdc_dataloader_spark.repos import make_pipeline
from icdc_dataloader_spark.sources.gen import gen_events_pandas


def _events(spark, tmp_path, **kw):
    """Write events parquet once; feed the SAME file to engine and oracle."""
    pdf = gen_events_pandas(**kw)
    os.makedirs(str(tmp_path), exist_ok=True)
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path, index=False)
    df = spark.read.parquet(path)
    records = pdf.to_dict("records")
    for r in records:  # pandas NaN -> None
        if r["content"] is None or (isinstance(r["content"], float)):
            r["content"] = None
    return df, records


def _engine_state(spark, pipe):
    rows = read_state(spark, pipe.lake).select(
        "repo", "path", "commit", "lang", "content_sha256"
    ).collect()
    return {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content_sha256"])
        for r in rows
    }


def _oracle_state(records):
    out = oracle.replay(records)
    return {
        k: (r["commit"], r["lang"], r["content_sha256"])
        for k, r in out["state"].items()
        if r["_op"] != "delete"
    }, out["errors"]


def test_full_replay_parity(spark, tmp_path):
    df, records = _events(
        spark, tmp_path,
        n_events=8000, n_repos=40, n_paths=10, seed=11, n_batches=6,
        p_delete=0.08, p_new=0.05, p_invalid_lang=0.02, p_empty_required=0.01,
    )
    pipe = make_pipeline(spark, str(tmp_path / "out"), n_buckets=8)
    res = pipe.run(df)
    assert len(res["applied"]) == 6
    got = _engine_state(spark, pipe)
    exp, oracle_errors = _oracle_state(records)
    assert got == exp
    # error counts line up too (quarantine + new-mode conflicts)
    n_merge_errors = 0
    err_dir = str(tmp_path / "out" / "errors")
    errs = spark.read.parquet(os.path.join(err_dir, "*")).collect()
    assert len(errs) == len(oracle_errors)


def test_shuffled_arrival_same_state(spark, tmp_path):
    """FIXTURES F2(b): same seq set, different arrival order -> same state.

    Holds for upsert/delete streams (tombstones + seq-LWW).  'new' events
    are excluded: NEW_MODE is apply-time-dependent by definition in the
    reference too (CREATE fails iff the node exists at load time,
    data_loader.py:912-918).
    """
    kw = dict(n_events=3000, n_repos=20, n_paths=6, p_delete=0.1, p_new=0.0,
              n_batches=4)
    df1, rec1 = _events(spark, tmp_path / "a", seed=21, shuffle_arrival=False, **kw)
    pipe1 = make_pipeline(spark, str(tmp_path / "o1"), n_buckets=4)
    pipe1.run(df1)

    # same events, shuffled arrival => different batch assignment
    pdf2 = gen_events_pandas(seed=21, shuffle_arrival=False, **kw)
    pdf2 = pdf2.sample(frac=1.0, random_state=5).reset_index(drop=True)
    import numpy as np
    pdf2["batch_id"] = (np.arange(len(pdf2)) * 4 // len(pdf2)).astype("int64")
    p2 = str(tmp_path / "b.parquet")
    pdf2.to_parquet(p2, index=False)
    pipe2 = make_pipeline(spark, str(tmp_path / "o2"), n_buckets=4)
    pipe2.run(spark.read.parquet(p2))

    assert _engine_state(spark, pipe1) == _engine_state(spark, pipe2)


def test_duplicate_replays_idempotent(spark, tmp_path):
    """FIXTURES F2(c): duplicated (repo,path,seq) rows and re-run -> no change."""
    df, records = _events(
        spark, tmp_path, n_events=2000, n_repos=15, n_paths=5, seed=31, n_batches=3,
    )
    pipe = make_pipeline(spark, str(tmp_path / "out"), n_buckets=4)
    pipe.run(df)
    s1 = _engine_state(spark, pipe)
    v1 = pipe.lake.latest_version()
    # full re-run: every batch already committed
    res = pipe.run(df)
    assert res["applied"] == []
    assert pipe.lake.latest_version() == v1
    assert _engine_state(spark, pipe) == s1


def test_resume_mid_replay(spark, tmp_path):
    """Kill after N batches; a NEW pipeline object resumes to the same state."""
    df, records = _events(
        spark, tmp_path, n_events=4000, n_repos=25, n_paths=8, seed=41,
        n_batches=5, p_delete=0.1,
    )
    root = str(tmp_path / "out")
    pipe = make_pipeline(spark, root, n_buckets=4)
    pipe.run(df, max_batches=2)  # "crash" here
    assert len(pipe.lake.committed_batch_ids()) == 2

    pipe2 = make_pipeline(spark, root, n_buckets=4)  # fresh process analogue
    res = pipe2.run(df)
    assert len(res["applied"]) == 3  # only the remaining batches
    exp, _ = _oracle_state(records)
    assert _engine_state(spark, pipe2) == exp


def test_ledger_lineage_and_metrics(spark, tmp_path):
    df, records = _events(
        spark, tmp_path, n_events=1000, n_repos=10, n_paths=4, seed=51, n_batches=2,
    )
    pipe = make_pipeline(spark, str(tmp_path / "out"), n_buckets=4)
    pipe.run(df)
    totals = pipe.ledger.totals()
    n_live = len(_engine_state(spark, pipe))
    assert totals["rows_inserted"] >= n_live
    rec = pipe.ledger.batch_record("0")
    assert rec and rec["lineage"], "per-partition lineage recorded"
    for b, info in rec["lineage"].items():
        assert info["min_seq"] <= info["max_seq"]
    assert pipe.ledger.low_water()
