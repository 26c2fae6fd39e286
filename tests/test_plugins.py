"""§2.10 plugin registry: duck-typed contract, dynamic loading, and the
VisitCreator-analogue MISSING_PARENT derivation (inferred parent synthesis,
visit_creator.py:49-97 semantics)."""

import pytest

from icdc_dataloader_spark.functions.identity import get_uuid
from icdc_dataloader_spark.plans.graph_loader import GraphLoader
from icdc_dataloader_spark.plugins import (
    EVENT_MISSING_PARENT,
    InferredParentCreator,
    PluginRegistry,
)
from icdc_dataloader_spark.repos import load_repos_model


def _write_tsv(path, header, rows):
    with open(path, "w") as fh:
        fh.write("\t".join(header) + "\n")
        for r in rows:
            fh.write("\t".join(r) + "\n")
    return str(path)


def test_duck_typed_contract():
    reg = PluginRegistry()

    class Bad:
        events = {EVENT_MISSING_PARENT}

    with pytest.raises(TypeError):
        reg.register(Bad())  # enforced like data_loader.py:153-167


def test_dynamic_load():
    reg = PluginRegistry()
    p = reg.load_plugin(
        "icdc_dataloader_spark.plugins",
        "InferredParentCreator",
        {"parent_type": "repo_owner", "id_field": "owner_id",
         "domain": "repos.example.org"},
    )
    assert p.should_run("repo_owner", EVENT_MISSING_PARENT)
    assert not p.should_run("repo_file", EVENT_MISSING_PARENT)


def test_missing_parent_synthesis(spark, tmp_path):
    """The reference drops edges to missing parents unless a plugin creates
    them (data_loader.py:988-1001).  With the InferredParentCreator the
    orphan's owner is synthesized (inferred=true, deterministic uuid5) and
    the edge resolves."""
    owners = _write_tsv(
        tmp_path / "owners.txt",
        ["type", "owner_id", "owner_name"],
        [["repo_owner", "o1", "Alice"]],
    )
    files = _write_tsv(
        tmp_path / "files.txt",
        ["type", "file_key", "repo", "path", "commit", "lang", "repo_owner.owner_id"],
        [
            ["repo_file", "r1:a", "r1", "a", "c1", "python", "o1"],
            ["repo_file", "r9:z", "r9", "z", "c9", "go", "oGHOST"],
        ],
    )
    reg = PluginRegistry()
    plugin = InferredParentCreator("repo_owner", "owner_id", "repos.example.org")
    reg.register(plugin)
    gl = GraphLoader(spark, str(tmp_path / "g"), load_repos_model(), registry=reg)
    m = gl.load_files([("repo_owner", owners), ("repo_file", files)])

    assert m["missing_parents"] == 0  # plugin healed the orphan
    assert m["relationships_created"] == 2
    assert plugin.nodes_created == 1

    owners_now = {r["owner_id"]: r for r in gl.nodes("repo_owner").collect()}
    assert set(owners_now) == {"o1", "oGHOST"}
    ghost = owners_now["oGHOST"]
    assert ghost["inferred"] is True
    assert ghost["uuid"] == get_uuid("repos.example.org", "repo_owner", "oGHOST")
    assert owners_now["o1"]["inferred"] is None  # pre-existing rows untouched
