"""Systematic crash-point sweep on the commit path (round-3 VERDICT #8).

One CDC batch commit = data-file write (Spark job, overwrite) ->
manifest writes (one per touched bucket, plus size-tiered merges) ->
snapshot tmp write -> fsync -> os.link (the atomic commit point) ->
ledger record.  A process death at ANY of those steps must leave the
table in a state from which a fresh pipeline (new LakeTable + ledger
objects, same directories — the process-restart model) resumes to the
exact same final state as a never-crashed control run.

Existing kill tests cover batch boundaries and torn ledger tails
(test_cdc_parity.py:118, test_metadata_scale.py:208-311, and
test_crash_and_export.py's orphan tmp snapshot); this file injects a
fault INSIDE LakeTable's commit at each step.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from icdc_dataloader_spark.plans.lake import LakeTable
from icdc_dataloader_spark.plans.merge import read_state
from icdc_dataloader_spark.repos import make_pipeline
from icdc_dataloader_spark.streaming.ledger import CheckpointLedger


class Boom(RuntimeError):
    pass


def _binlog(spark, root):
    """3 batches; batch 1 (the crash target) touches many keys so its
    commit writes multiple bucket manifests (points 1-2 need >=2)."""
    rows = []
    seq = 0
    for batch in range(3):
        for i in range(40):
            seq += 1
            rows.append(dict(
                seq=seq, op="delete" if seq % 9 == 0 else "upsert",
                repo=f"r{i % 20}", path=f"p{(i + batch) % 7}",
                commit=f"c{seq}", lang="python", content=f"v{seq}",
                batch_id=batch,
            ))
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.Timestamp("2024-01-01").as_unit("us")
    for c in ("commit", "lang", "content"):
        pdf.loc[pdf["op"] == "delete", c] = None
    spark.createDataFrame(pdf).write.partitionBy("batch_id").parquet(root)
    return spark.read.parquet(root)


def _state(spark, pipe):
    rows = read_state(spark, pipe.lake).select(
        "repo", "path", "commit", "content_sha256"
    ).collect()
    return {(r["repo"], r["path"]): (r["commit"], r["content_sha256"])
            for r in rows}


def _inject(monkeypatch, point, log_dir):
    """Arm the fault for ``point``; every injector raises Boom exactly at
    the targeted step of the NEXT commit."""
    if point in ("first_manifest", "second_manifest"):
        limit = 1 if point == "first_manifest" else 2
        orig = LakeTable._write_manifest
        calls = {"n": 0}

        def boom_manifest(self, entries):
            calls["n"] += 1
            if calls["n"] >= limit:
                raise Boom(point)
            return orig(self, entries)

        monkeypatch.setattr(LakeTable, "_write_manifest", boom_manifest)
    elif point == "snapshot_tmp_fsync":
        # target the SNAPSHOT tmp's fsync specifically: a blanket raise
        # fires first at _write_manifest's fsync (lake.py) and would
        # re-test the manifest crash instead of the state this point
        # claims (snapshot json fully written but not durable)
        real_fsync = os.fsync

        def boom_fsync(fd):
            try:
                target = os.readlink(f"/proc/self/fd/{fd}")
            except OSError:  # pragma: no cover
                target = ""
            if (os.path.dirname(target) == log_dir
                    and os.path.basename(target).startswith(".tmp-")):
                raise Boom(point)
            return real_fsync(fd)

        monkeypatch.setattr(
            "icdc_dataloader_spark.plans.lake.os.fsync", boom_fsync
        )
    elif point == "snapshot_link":
        real_link = os.link

        def boom_link(src, dst, **kw):
            if os.path.dirname(dst) == log_dir:
                raise Boom(point)
            return real_link(src, dst, **kw)

        monkeypatch.setattr(
            "icdc_dataloader_spark.plans.lake.os.link", boom_link
        )
    elif point == "after_commit_before_ledger":
        def boom_record(self, *a, **kw):
            raise Boom(point)

        monkeypatch.setattr(CheckpointLedger, "record", boom_record)
    else:  # pragma: no cover
        raise ValueError(point)


POINTS = [
    "first_manifest",            # data files on disk, zero metadata
    "second_manifest",           # some bucket manifests written, no snapshot
    "snapshot_tmp_fsync",        # tmp json written, not durable
    "snapshot_link",             # tmp durable, commit point not taken
    "after_commit_before_ledger",  # snapshot live, ledger behind
]


@pytest.mark.parametrize("point", POINTS)
def test_crash_point_resumes_to_identical_state(
    spark, tmp_path, monkeypatch, point
):
    df = _binlog(spark, str(tmp_path / "binlog"))

    control = make_pipeline(
        spark, str(tmp_path / "control"), n_buckets=4, strategy="mor",
        compact_every=2,
    )
    control.run(df)
    expected = _state(spark, control)

    root = str(tmp_path / f"crash_{point}")
    pipe = make_pipeline(
        spark, root, n_buckets=4, strategy="mor", compact_every=2
    )
    pipe.run(df, max_batches=1)  # batch 0 commits cleanly
    batch1 = df.filter(F.col("batch_id") == 1).drop("batch_id")
    _inject(monkeypatch, point, pipe.lake.log_dir)
    with pytest.raises(Boom):
        pipe.apply_batch(batch1, 1)
    monkeypatch.undo()  # "restart": fault gone with the dead process

    resumed = make_pipeline(
        spark, root, n_buckets=4, strategy="mor", compact_every=2
    )
    res = resumed.run(df)
    assert not res["quarantined"]
    assert _state(spark, resumed) == expected
    committed = resumed.lake.committed_batch_ids()
    assert all(str(b) in committed for b in (0, 1, 2))
    # ledger caught up (incl. the commit-then-crash heal at cdc.py:183-187)
    assert all(resumed.ledger.is_applied(b) for b in (0, 1, 2))
    # snapshot chain is a clean linear history: each version's parent is
    # the previous version (no forked or skipped commits after the crash)
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(resumed.lake.log_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    for a, b in zip(versions, versions[1:]):
        assert b == a + 1
        assert resumed.lake.snapshot(b)["parent"] == a
    # idempotence: a further run is a no-op at the same state
    res2 = resumed.run(df)
    assert res2["applied"] == [] and _state(spark, resumed) == expected
