"""Bucket-targeted compaction: only delta-bearing buckets rewrite; every
other bucket's base files are carried by reference (round-4 scale fix —
the in-loop compaction was a full-table rewrite per cadence)."""

import pandas as pd
from pyspark.sql import functions as F

from icdc_dataloader_spark.plans.merge import compact, read_state
from icdc_dataloader_spark.repos import make_pipeline


def _drain(spark, pipe, tmp_path, name, rows):
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.Timestamp("2024-01-01").as_unit("us")
    for c in ("commit", "lang", "content"):
        pdf.loc[pdf["op"] == "delete", c] = None
    src = str(tmp_path / name)
    spark.createDataFrame(pdf).write.partitionBy("batch_id").parquet(src)
    pipe.run(spark.read.parquet(src))


def _ev(seq, op, repo, batch_id=0):
    return dict(seq=seq, op=op, repo=repo, path="p", commit=f"c{seq}",
                lang="python", content=f"v{seq}", batch_id=batch_id)


def _state(spark, pipe):
    return {
        (r["repo"], r["path"]): r["commit"]
        for r in read_state(spark, pipe.lake)
        .select("repo", "path", "commit").collect()
    }


def test_partial_compact_carries_untouched_buckets(spark, tmp_path):
    pipe = make_pipeline(
        spark, str(tmp_path / "lake"), n_buckets=8, strategy="mor",
        compact_every=100,
    )
    _drain(spark, pipe, tmp_path, "d1",
           [_ev(i, "upsert", f"r{i}") for i in range(1, 40)])
    compact(spark, pipe.lake)  # full: clean all-base snapshot
    base_before = {
        f["path"]: f["bucket"] for f in pipe.lake.snapshot()["files"]
    }
    expected = _state(spark, pipe)

    _drain(spark, pipe, tmp_path, "d2", [_ev(100, "upsert", "r5", 1)])
    expected[("r5", "p")] = "c100"
    touched = {f["bucket"] for f in pipe.lake.delta_files()}
    assert len(touched) == 1

    v = compact(spark, pipe.lake, min_delta_files=1)
    files_after = {
        f["path"]: f["bucket"] for f in pipe.lake.snapshot(v)["files"]
    }
    # no deltas remain; untouched buckets' base files carried VERBATIM
    assert not pipe.lake.delta_files(v)
    carried = {p for p, b in files_after.items() if b not in touched}
    assert carried == {p for p, b in base_before.items()
                       if b not in touched}
    # the touched bucket was rewritten (its old base paths are gone)
    old_touched = {p for p, b in base_before.items() if b in touched}
    assert not (old_touched & set(files_after))
    assert _state(spark, pipe) == expected


def test_min_delta_files_noop_when_nothing_ripe(spark, tmp_path):
    pipe = make_pipeline(
        spark, str(tmp_path / "lake"), n_buckets=4, strategy="mor",
        compact_every=100,
    )
    _drain(spark, pipe, tmp_path, "d1",
           [_ev(i, "upsert", f"r{i}") for i in range(1, 10)])
    compact(spark, pipe.lake)
    v = pipe.lake.latest_version()
    assert compact(spark, pipe.lake, min_delta_files=1) == v  # no deltas


def test_default_loop_matches_full_compaction_state(spark, tmp_path):
    rows = []
    seq = 0
    for b in range(6):
        for i in range(30):
            seq += 1
            rows.append(_ev(seq, "delete" if seq % 11 == 0 else "upsert",
                            f"r{(i * 7 + b) % 25}", b))
    full = make_pipeline(
        spark, str(tmp_path / "full"), n_buckets=4, strategy="mor",
        compact_every=100,
    )
    _drain(spark, full, tmp_path, "dA", rows)
    compact(spark, full.lake)

    loop = make_pipeline(
        spark, str(tmp_path / "loop"), n_buckets=4, strategy="mor",
        compact_every=2,  # in-loop bucket-targeted compactions
    )
    _drain(spark, loop, tmp_path, "dB", rows)
    assert _state(spark, loop) == _state(spark, full)


def test_vacuum_reclaims_superseded_files_in_mixed_dirs(spark, tmp_path):
    """Partial compaction supersedes SOME files of an old version dir while
    carrying others; vacuum must reclaim exactly the dead ones (dir-level
    vacuum pinned them forever — round-4 fix)."""
    import os

    pipe = make_pipeline(
        spark, str(tmp_path / "lake"), n_buckets=8, strategy="mor",
        compact_every=100,
    )
    _drain(spark, pipe, tmp_path, "d1",
           [_ev(i, "upsert", f"r{i}") for i in range(1, 40)])
    compact(spark, pipe.lake)
    base_by_path = {
        f["path"]: f["bucket"] for f in pipe.lake.snapshot()["files"]
    }
    expected = _state(spark, pipe)

    _drain(spark, pipe, tmp_path, "d2", [_ev(100, "upsert", "r5", 1)])
    expected[("r5", "p")] = "c100"
    touched = {f["bucket"] for f in pipe.lake.delta_files()}
    compact(spark, pipe.lake, min_delta_files=1)
    pipe.lake.vacuum(keep_last=1)

    root = pipe.lake.root
    superseded = [p for p, b in base_by_path.items() if b in touched]
    carried = [p for p, b in base_by_path.items() if b not in touched]
    assert superseded and carried
    assert all(not os.path.exists(os.path.join(root, p)) for p in superseded)
    assert all(os.path.exists(os.path.join(root, p)) for p in carried)
    assert _state(spark, pipe) == expected  # reads fully intact
