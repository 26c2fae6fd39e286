"""Crash-point sweep on the PARTIAL (bucket-targeted) compaction path
(round-4 VERDICT #4).

Bucket-targeted compaction introduced a new commit shape: the compacted
buckets' files are rewritten while every untouched bucket's files are
CARRIED BY REFERENCE into the new snapshot's manifests.
test_commit_crash_sweep.py covers the merge-batch commit; this file
injects the same fault family INSIDE the in-loop partial compact that
apply_batch triggers at the compaction cadence, and asserts:

- a fresh pipeline over the same directories resumes to the exact state
  of a never-crashed control run;
- vacuum after the resume never unlinks a live (manifest-referenced)
  file — the crashed compact's half-written outputs are the only things
  reclaimed.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

import icdc_dataloader_spark.streaming.cdc as cdc_mod
from icdc_dataloader_spark.plans.lake import LakeTable
from icdc_dataloader_spark.plans.merge import read_state
from icdc_dataloader_spark.repos import make_pipeline
from icdc_dataloader_spark.streaming.ledger import CheckpointLedger


class Boom(RuntimeError):
    pass


def _binlog(spark, root):
    """4 batches; batch 1 (the crash target) touches ONLY key r0 so the
    cadence-1 compaction it triggers is genuinely PARTIAL: r0's bucket
    rewrites, every other bucket's base (from batch 0's compact) is
    carried by reference — the new commit shape this sweep targets."""
    rows = []
    seq = 0
    for batch in range(4):
        n = 2 if batch == 1 else 40
        for i in range(n):
            seq += 1
            rows.append(dict(
                seq=seq, op="delete" if seq % 9 == 0 else "upsert",
                repo="r0" if batch == 1 else f"r{i % 20}",
                path=f"p{(i + batch) % 7}",
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


def _arm(monkeypatch, point, log_dir):
    """Arm ``point``'s fault so it fires during the NEXT commit attempt
    (called just before the in-loop compact runs)."""
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
        # would fire first at _write_manifest's fsync and never reach the
        # state this point claims to test (snapshot json fully written
        # but not durable, commit link not taken)
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
    elif point == "after_compact_before_ledger":
        monkeypatch.setattr(
            CheckpointLedger, "record",
            lambda self, *a, **kw: (_ for _ in ()).throw(Boom(point)),
        )
    else:  # pragma: no cover
        raise ValueError(point)


POINTS = [
    "first_manifest",            # compact data written, zero metadata
    "second_manifest",           # carried+rewritten manifests half done
    "snapshot_tmp_fsync",        # compact snapshot json not durable
    "snapshot_link",             # compact commit point not taken
    "after_compact_before_ledger",  # compact live, batch ledger behind
]


@pytest.mark.parametrize("point", POINTS)
def test_partial_compact_crash_resumes_and_vacuum_is_safe(
    spark, tmp_path, monkeypatch, point
):
    df = _binlog(spark, str(tmp_path / "binlog"))

    control = make_pipeline(
        spark, str(tmp_path / "control"), n_buckets=4, strategy="mor",
        compact_every=1,
    )
    control.run(df)
    expected = _state(spark, control)

    root = str(tmp_path / f"crash_{point}")
    pipe = make_pipeline(
        spark, root, n_buckets=4, strategy="mor", compact_every=1
    )
    pipe.run(df, max_batches=1)  # batch 0 commits + compacts cleanly
    seen = {}

    real_compact = cdc_mod.compact

    def arming_compact(*a, **kw):
        # the crash-target compact must be PARTIAL: only r0's bucket
        # holds deltas, the rest of the table is carried by reference
        seen["delta_buckets"] = {f["bucket"] for f in pipe.lake.delta_files()}
        if point != "after_compact_before_ledger":
            _arm(monkeypatch, point, pipe.lake.log_dir)
        return real_compact(*a, **kw)

    monkeypatch.setattr(cdc_mod, "compact", arming_compact)
    if point == "after_compact_before_ledger":
        # the compact itself succeeds; the batch's ledger record (which
        # follows the in-loop compact) dies
        _arm(monkeypatch, point, pipe.lake.log_dir)

    batch1 = df.filter(F.col("batch_id") == 1).drop("batch_id")
    with pytest.raises(Boom):
        pipe.apply_batch(batch1, 1)
    monkeypatch.undo()  # "restart": fault dies with the process

    # batch 1's APPEND committed before the compact blew up, and the
    # compact it reached was bucket-targeted (strict subset)
    assert pipe.lake.is_batch_committed("1")
    assert 0 < len(seen["delta_buckets"]) < 4, seen

    resumed = make_pipeline(
        spark, root, n_buckets=4, strategy="mor", compact_every=2
    )
    res = resumed.run(df)
    assert not res["quarantined"]
    assert _state(spark, resumed) == expected
    assert all(resumed.ledger.is_applied(b) for b in range(4))

    # linear snapshot history (the crashed compact never forked it)
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(resumed.lake.log_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    for a, b in zip(versions, versions[1:]):
        assert b == a + 1
        assert resumed.lake.snapshot(b)["parent"] == a

    # vacuum safety: reclaim the crashed compact's half-written outputs
    # without unlinking anything a kept snapshot references
    resumed.lake.vacuum(keep_last=2)
    latest = resumed.lake.latest_version()
    for v in (latest - 1, latest):
        for f in resumed.lake.snapshot(v)["files"]:
            assert os.path.exists(os.path.join(resumed.lake.root, f["path"])), (
                f"vacuum unlinked live file {f['path']} of v{v}"
            )
    assert _state(spark, resumed) == expected

    # idempotence after all of it
    res2 = resumed.run(df)
    assert res2["applied"] == [] and _state(spark, resumed) == expected
