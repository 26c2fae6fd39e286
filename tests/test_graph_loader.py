"""Full load cycle over the two-type model (repo_owner <- repo_file):
nodes-then-relationships barrier, golden counts, re-load updates, cascade
delete — the shape of the reference's tests/test_reloading_data.py."""

import pytest

from icdc_dataloader_spark.plans.graph_loader import GraphLoader
from icdc_dataloader_spark.repos import load_repos_model


def _write_tsv(path, header, rows):
    with open(path, "w") as fh:
        fh.write("\t".join(header) + "\n")
        for r in rows:
            fh.write("\t".join(r) + "\n")
    return str(path)


@pytest.fixture
def dataset(tmp_path):
    owners = _write_tsv(
        tmp_path / "owners.txt",
        ["type", "owner_id", "owner_name"],
        [
            ["repo_owner", "o1", "Alice"],
            ["repo_owner", "o2", "Bob"],
        ],
    )
    files = _write_tsv(
        tmp_path / "files.txt",
        ["type", "file_key", "repo", "path", "commit", "lang",
         "owned_by$since", "repo_owner.owner_id"],
        [
            ["repo_file", "r1:a", "r1", "a", "c1", "python", "2020", "o1"],
            ["repo_file", "r1:b", "r1", "b", "c2", "go", "2021", "o1"],
            ["repo_file", "r2:a", "r2", "a", "c3", "rust", "2022", "o2"],
            ["repo_file", "r3:a", "r3", "a", "c4", "c", "2023", "oMISSING"],
        ],
    )
    return owners, files


def test_load_nodes_then_relationships(spark, tmp_path, dataset):
    owners, files = dataset
    gl = GraphLoader(spark, str(tmp_path / "graph"), load_repos_model())
    # files listed BEFORE owners: the stage barrier must still resolve all
    # parents (nodes for all files load before any relationship pass,
    # reference data_loader.py:365-372)
    m = gl.load_files([("repo_file", files), ("repo_owner", owners)])
    assert m["repo_owner"]["created"] == 2
    assert m["repo_file"]["created"] == 4
    assert m["relationships_created"] == 3
    assert m["missing_parents"] == 1  # oMISSING

    edges = gl.edges().collect()
    assert len(edges) == 3
    assert all(e["rel_type"] == "owned_by" for e in edges)
    assert all(e["rel_props"]["since"] in ("2020", "2021", "2022") for e in edges)


def test_reload_updates_not_creates(spark, tmp_path, dataset):
    owners, files = dataset
    gl = GraphLoader(spark, str(tmp_path / "graph"), load_repos_model())
    gl.load_files([("repo_owner", owners), ("repo_file", files)])
    m2 = gl.load_files([("repo_owner", owners), ("repo_file", files)])
    assert m2["repo_owner"]["created"] == 0 and m2["repo_owner"]["updated"] == 2
    assert m2["repo_file"]["created"] == 0 and m2["repo_file"]["updated"] == 4


def test_cascade_delete_owner(spark, tmp_path, dataset):
    owners, files = dataset
    gl = GraphLoader(spark, str(tmp_path / "graph"), load_repos_model())
    gl.load_files([("repo_owner", owners), ("repo_file", files)])
    # deleting o1 cascades to its two exclusively-owned files;
    # o2's file and the orphan r3:a survive
    n_nodes, n_rels = gl.delete_cascade("repo_owner", ["o1"])
    assert (n_nodes, n_rels) == (3, 2)  # o1 + 2 files; their 2 edges
    assert gl.nodes("repo_owner").count() == 1
    assert gl.nodes("repo_file").count() == 2
    assert gl.edges().count() == 1
