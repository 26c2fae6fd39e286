"""Per-SOURCE-partition GC watermark (CDCPipeline(source_partition_col)).

The round-4 upgrade of the ADVICE finding: with a multi-partition source
(independent per-partition seq progressions), the bucket-based watermark
requires a globally-monotone sequence at late_horizon=0.  Tracking max
applied seq PER SOURCE PARTITION makes per-partition monotone appends —
the natural Kafka/binlog model — sufficient: min over partitions bounds
every future event.
"""

import os

import pandas as pd

from icdc_dataloader_spark.plans.merge import read_state
from icdc_dataloader_spark.repos import make_pipeline
from icdc_dataloader_spark.streaming.ledger import CheckpointLedger


def _write(spark, root, name, rows):
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.Timestamp("2024-01-01").as_unit("us")
    spark.createDataFrame(pdf).write.partitionBy("batch_id").parquet(
        os.path.join(root, name)
    )
    return os.path.join(root, name)


def _ev(seq, op, repo, src, batch_id, content="x"):
    return dict(
        seq=seq, op=op, repo=repo, path="p", src=src,
        commit=None if op == "delete" else f"c{seq}",
        lang=None if op == "delete" else "python",
        content=None if op == "delete" else content,
        batch_id=batch_id,
    )


def _state(spark, pipe):
    return {
        (r["repo"], r["path"]): r["commit"]
        for r in read_state(spark, pipe.lake)
        .select("repo", "path", "commit").collect()
    }


def test_lagging_partition_safe_at_late_horizon_zero(spark, tmp_path):
    """Partition A races ahead (seqs 101-103, incl. the rA tombstone at
    102); partition B lags (seq 1 in drain 1, seq 50 in drain 2).  With
    bucket watermarks this is the documented resurrect hazard at
    late_horizon=0; with per-partition watermarks B's recorded max (1)
    pins GC, the tombstone survives the between-drain compaction, and the
    late seq-50 upsert correctly loses LWW."""
    root = str(tmp_path)
    d1 = _write(spark, root, "d1", [
        _ev(1, "upsert", "rA", "B", 0),
        _ev(101, "upsert", "rA", "A", 0),
        _ev(102, "delete", "rA", "A", 1),
        _ev(103, "upsert", "rB", "A", 1),
    ])
    d2 = _write(spark, root, "d2", [
        _ev(50, "upsert", "rA", "B", 2),   # late, lagging partition
        _ev(104, "upsert", "rB", "A", 2),
    ])
    pipe = make_pipeline(
        spark, os.path.join(root, "out"), n_buckets=1, strategy="mor",
        compact_every=1, late_horizon=0, source_partition_col="src",
    )
    pipe.run(spark.read.parquet(d1))
    # B's max applied seq (1) pinned the watermark -> tombstone retained
    assert pipe.ledger.source_low_water() == {"B": 1, "A": 103}
    assert pipe.lake.read(spark).filter("_op = 'delete'").count() == 1
    pipe.run(spark.read.parquet(d2))
    assert _state(spark, pipe) == {("rB", "p"): "c104"}  # rA stays deleted


def test_gc_reclaims_once_all_partitions_advance(spark, tmp_path):
    root = str(tmp_path)
    d1 = _write(spark, root, "d1", [
        _ev(1, "upsert", "rA", "B", 0),
        _ev(102, "delete", "rA", "A", 1),
    ])
    d2 = _write(spark, root, "d2", [
        _ev(200, "upsert", "rB", "B", 2),  # B catches up past the tombstone
        _ev(201, "upsert", "rC", "A", 2),
    ])
    d3 = _write(spark, root, "d3", [
        _ev(300, "upsert", "rC", "A", 3),
        _ev(301, "upsert", "rB", "B", 3),
    ])
    pipe = make_pipeline(
        spark, os.path.join(root, "out"), n_buckets=1, strategy="mor",
        compact_every=1, late_horizon=0, source_partition_col="src",
    )
    pipe.run(spark.read.parquet(d1))
    assert pipe.lake.read(spark).filter("_op = 'delete'").count() == 1
    pipe.run(spark.read.parquet(d2))
    # drain 3's in-loop compaction sees min(A:201, B:200) = 200 > 102
    pipe.run(spark.read.parquet(d3))
    assert pipe.lake.read(spark).filter("_op = 'delete'").count() == 0
    assert _state(spark, pipe) == {
        ("rB", "p"): "c301", ("rC", "p"): "c300",
    }


def test_source_watermarks_survive_restart_and_column_is_metadata(
    spark, tmp_path
):
    root = str(tmp_path)
    d1 = _write(spark, root, "d1", [
        _ev(10, "upsert", "rA", "A", 0),
        _ev(20, "upsert", "rB", "B", 0),
    ])
    pipe = make_pipeline(
        spark, os.path.join(root, "out"), n_buckets=1, strategy="mor",
        compact_every=1, late_horizon=0, source_partition_col="src",
    )
    pipe.run(spark.read.parquet(d1))
    # the partition column never reaches the lake schema
    assert "src" not in [f.name for f in pipe.lake.schema().fields]
    # watermarks persist across process restart (fresh ledger from disk)
    led2 = CheckpointLedger(pipe.ledger.root)
    assert led2.source_low_water() == {"A": 10, "B": 20}


def test_quarantined_rows_do_not_advance_watermark(spark, tmp_path):
    """Round-4 self-review: a validation-quarantined row's seq must not
    advance its partition's watermark — the reference workflow fixes and
    re-submits it at the ORIGINAL seq, and an overrun watermark could GC
    a tombstone the re-submit still needs."""
    root = str(tmp_path)
    rows = [
        _ev(10, "upsert", "rA", "A", 0),
        # invalid lang -> quarantined, NOT applied; seq 99 must not
        # become partition A's watermark
        dict(seq=99, op="upsert", repo="rB", path="p", src="A",
             commit="c99", lang="NOT_A_LANG", content="x", batch_id=0),
    ]
    d1 = _write(spark, root, "d1", rows)
    pipe = make_pipeline(
        spark, os.path.join(root, "out"), n_buckets=1, strategy="mor",
        compact_every=1, late_horizon=0, source_partition_col="src",
    )
    res = pipe.run(spark.read.parquet(d1))
    assert not res["quarantined"]  # batch applied (bad ROW quarantined)
    assert pipe.ledger.source_low_water() == {"A": 10}
