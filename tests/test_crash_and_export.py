"""Crash robustness of the commit protocol + read-side export."""

import json
import os

from icdc_dataloader_spark.plans.export import export_index
from icdc_dataloader_spark.plans.merge import merge_into, read_state
from icdc_dataloader_spark.repos import create_repos_table, load_repos_model


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string,"
        " content_sha256 string, _seq long, _op string",
    )


def test_orphan_tmp_snapshot_ignored(spark, tmp_path):
    """Crash mid-commit leaves a .tmp-* snapshot: never visible, never
    breaks reads; the next commit proceeds normally."""
    lake = create_repos_table(str(tmp_path / "t"), n_buckets=2)
    merge_into(spark, lake, _batch(spark, [("r", "a", "c1", "python", "x", None, 1, "upsert")]),
               batch_id="b1")
    v = lake.latest_version()
    # simulate a crash: partial tmp snapshot + orphan data dir
    with open(os.path.join(lake.log_dir, ".tmp-crashed.json"), "w") as fh:
        fh.write('{"version": 99')  # truncated JSON
    os.makedirs(os.path.join(lake.root, "data/v99"), exist_ok=True)
    assert lake.latest_version() == v
    assert read_state(spark, lake).count() == 1
    merge_into(spark, lake, _batch(spark, [("r", "b", "c2", "go", "y", None, 2, "upsert")]),
               batch_id="b2")
    assert lake.latest_version() == v + 1
    assert read_state(spark, lake).count() == 2


def test_duplicate_version_commit_rejected(spark, tmp_path):
    """Two writers racing to the same version: second atomic rename loses."""
    import pytest

    lake = create_repos_table(str(tmp_path / "t"), n_buckets=2)
    snap = lake.snapshot()
    with pytest.raises(RuntimeError):
        lake._write_snapshot(0, snap)  # version 0 already exists


def test_export_index_jsonl(spark, tmp_path):
    lake = create_repos_table(str(tmp_path / "t"), n_buckets=2)
    merge_into(
        spark, lake,
        _batch(spark, [
            ("r1", "a", "c1", "python", "hello", None, 1, "upsert"),
            ("r2", "b", "c2", "go", "world", None, 2, "upsert"),
            ("r1", "a", None, None, None, None, 3, "delete"),
        ]),
        batch_id="b1",
    )
    out = str(tmp_path / "index")
    n = export_index(
        spark, lake, out,
        node_type="repo_file", model=load_repos_model(),
        select=["repo", "path", "commit", "lang"], doc_id_col="repo",
    )
    assert n == 1  # tombstoned row excluded
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    doc = json.loads(open(os.path.join(out, files[0])).readline())
    assert doc["repo"] == "r2" and doc["_id"] == "r2"
