"""Incremental change feed between snapshots (plans/merge.changes_between)
— the consume side of the CDC engine (Iceberg incremental-read analogue)."""

import pandas as pd
from pyspark.sql import functions as F

from icdc_dataloader_spark.plans.merge import (
    changed_buckets,
    changes_between,
    compact,
)
from icdc_dataloader_spark.repos import make_pipeline


def _drain(spark, pipe, tmp_path, name, rows):
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.Timestamp("2024-01-01").as_unit("us")
    for c in ("commit", "lang", "content"):
        pdf.loc[pdf["op"] == "delete", c] = None
    src = str(tmp_path / name)
    spark.createDataFrame(pdf).write.partitionBy("batch_id").parquet(src)
    pipe.run(spark.read.parquet(src))
    return pipe.lake.latest_version()


def _ev(seq, op, repo, batch_id=0, path="p"):
    return dict(seq=seq, op=op, repo=repo, path=path, commit=f"c{seq}",
                lang="python", content=f"v{seq}", batch_id=batch_id)


def test_insert_update_delete_and_silence(spark, tmp_path):
    pipe = make_pipeline(
        spark, str(tmp_path / "lake"), n_buckets=4, strategy="mor",
        compact_every=100,
    )
    v1 = _drain(spark, pipe, tmp_path, "d1", [
        _ev(1, "upsert", "rKeep"),     # unchanged -> silent
        _ev(2, "upsert", "rUpd"),      # later updated
        _ev(3, "upsert", "rGone"),     # later deleted
        _ev(4, "upsert", "rDead"),     # deleted in the same later drain…
    ])
    v2 = _drain(spark, pipe, tmp_path, "d2", [
        _ev(10, "upsert", "rUpd", 1),
        _ev(11, "delete", "rGone", 1),
        _ev(12, "delete", "rDead", 1),
        _ev(13, "upsert", "rNew", 1),
    ])
    rows = {
        r["repo"]: (r["change_type"], r["commit"])
        for r in changes_between(spark, pipe.lake, v1, v2)
        .select("repo", "change_type", "commit").collect()
    }
    assert rows == {
        "rUpd": ("update", "c10"),
        "rGone": ("delete", None),
        "rDead": ("delete", None),
        "rNew": ("insert", "c13"),
    }


def test_dead_before_and_after_emits_nothing_even_after_gc(spark, tmp_path):
    pipe = make_pipeline(
        spark, str(tmp_path / "lake"), n_buckets=2, strategy="mor",
        compact_every=1, late_horizon=0,  # GC in the loop
    )
    v1 = _drain(spark, pipe, tmp_path, "d1", [
        _ev(1, "upsert", "rA"),
        _ev(2, "delete", "rA", 1),
        _ev(3, "upsert", "rB", 1),
    ])
    v2 = _drain(spark, pipe, tmp_path, "d2", [
        _ev(10, "upsert", "rB", 2),   # forces commits + compaction
    ])
    # rA was dead at v1 and is dead at v2 (tombstone possibly GC'd): silent
    rows = changes_between(spark, pipe.lake, v1, v2).collect()
    assert {r["repo"] for r in rows} == {"rB"}


def test_bucket_pruning_restricts_the_read(spark, tmp_path):
    """A drain touching one key must yield changed_buckets ⊂ all buckets,
    and the feed still finds exactly that key's change."""
    n_buckets = 8
    pipe = make_pipeline(
        spark, str(tmp_path / "lake"), n_buckets=n_buckets, strategy="mor",
        compact_every=100,
    )
    v1 = _drain(spark, pipe, tmp_path, "d1", [
        _ev(i, "upsert", f"r{i}") for i in range(1, 30)
    ])
    v2 = _drain(spark, pipe, tmp_path, "d2", [
        _ev(100, "upsert", "r5", 1),
    ])
    touched = changed_buckets(pipe.lake, v1, v2)
    assert 0 < len(touched) < n_buckets
    rows = changes_between(spark, pipe.lake, v1, v2).collect()
    assert [(r["repo"], r["change_type"]) for r in rows] == [("r5", "update")]


def test_emptied_bucket_still_emits_deletes(spark, tmp_path):
    """Round-4 self-review: a bucket whose files were all REMOVED between
    the versions (tombstone GC'd + compacted to zero rows) must still be
    diffed — an added-files-only bucket diff silently dropped its delete
    events."""
    pipe = make_pipeline(
        spark, str(tmp_path / "lake"), n_buckets=2, strategy="mor",
        compact_every=100,
    )
    _drain(spark, pipe, tmp_path, "d1", [_ev(1, "upsert", "rOnly")])
    v1 = pipe.lake.latest_version()
    _drain(spark, pipe, tmp_path, "d2", [_ev(2, "delete", "rOnly", 1)])
    compact(spark, pipe.lake, drop_tombstones_below_seq=10_000)
    v2 = pipe.lake.latest_version()
    assert not pipe.lake.snapshot(v2)["files"]  # table fully emptied
    assert changed_buckets(pipe.lake, v1, v2)   # removed files counted
    rows = changes_between(spark, pipe.lake, v1, v2).collect()
    assert [(r["repo"], r["change_type"]) for r in rows] == [
        ("rOnly", "delete")
    ]
