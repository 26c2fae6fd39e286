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


def test_model_index_docs_shapes(spark):
    """es_loader.py:167-209 get_model_data parity on the fixtures model."""
    import json

    from icdc_dataloader_spark.plans.export import (
        about_page_docs, export_model_index, model_index_docs,
    )
    from icdc_dataloader_spark.repos import load_repos_model

    model = load_repos_model()

    nodes = model_index_docs(spark, model, "node").collect()
    assert {r["node"] for r in nodes} == set(model.nodes)
    assert all(
        r["type"] == "node" and r["node_name"] == r["node"] == r["node_kw"]
        for r in nodes
    )

    props = model_index_docs(spark, model, "property").collect()
    by_key = {(r["node"], r["property"]): r for r in props}
    # every model property appears exactly once with the reference's fields
    for nt in model.nodes:
        for pname, p in model.props_of(nt).items():
            r = by_key[(nt, pname)]
            assert r["type"] == "property"
            assert r["property_kw"] == pname and r["property_name"] == pname
            assert r["property_required"] == bool(p.required)
            assert r["property_type"] == ("Enum" if p.enum else p.type)

    values = model_index_docs(spark, model, "value").collect()
    enum_pairs = {
        (nt, pn, str(v))
        for nt in model.nodes
        for pn, p in model.props_of(nt).items()
        if p.enum
        for v in p.enum
    }
    assert {(r["node"], r["property"], r["value"]) for r in values} == enum_pairs
    assert all(r["property_type"] == "Enum" and r["value_kw"] == r["value"]
               for r in values)


def test_export_model_index_bulk_wire(spark, tmp_path):
    import glob
    import json

    from icdc_dataloader_spark.plans.export import export_model_index
    from icdc_dataloader_spark.repos import load_repos_model

    model = load_repos_model()
    out = str(tmp_path / "model_idx")
    n = export_model_index(spark, model, out, "property", index_name="model_props")
    lines = []
    for f in sorted(glob.glob(out + "/part-*")):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == 2 * n
    for i in range(0, len(lines), 2):
        action = json.loads(lines[i])
        doc = json.loads(lines[i + 1])
        assert action == {"index": {"_index": "model_props"}}
        assert doc["type"] == "property"


def test_about_page_docs(spark, tmp_path):
    import json

    from icdc_dataloader_spark.plans.export import about_page_docs

    about = tmp_path / "about.yml"
    about.write_text(
        "- page: home\n  title: Home\n  content: [a, b]\n"
        "- page: support\n  title: Support\n"
    )
    rows = {r["_id"]: r for r in about_page_docs(spark, str(about)).collect()}
    assert set(rows) == {"pagehome", "pagesupport"}
    assert json.loads(rows["pagehome"]["doc"])["title"] == "Home"
