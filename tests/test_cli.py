"""CLI + config surface (reference loader.py:31-240 / config.py:13-116):
a user's existing data-loader config file and flags drive the Spark
engine end-to-end."""

import json
import os

import pytest

from icdc_dataloader_spark import cli
from icdc_dataloader_spark.config import (
    DELETE_MODE,
    UPSERT_MODE,
    LoaderConfig,
)

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def _write_tsv(path, header, rows):
    with open(path, "w") as fh:
        fh.write("\t".join(header) + "\n")
        for r in rows:
            fh.write("\t".join(r) + "\n")
    return str(path)


def _dataset(tmp_path):
    d = tmp_path / "dataset"
    d.mkdir()
    _write_tsv(d / "01_owners.txt", ["type", "owner_id", "owner_name"],
               [["repo_owner", "o1", "Alice"], ["repo_owner", "o2", "Bob"]])
    _write_tsv(
        d / "02_files.txt",
        ["type", "file_key", "repo", "path", "commit", "lang",
         "repo_owner.owner_id"],
        [["repo_file", "r1:a", "r1", "a", "c1", "python", "o1"],
         ["repo_file", "r2:b", "r2", "b", "c2", "go", "o2"]],
    )
    return str(d)


def _config_yaml(tmp_path, dataset, graph_root, extra=""):
    cfg = tmp_path / "config.yml"
    cfg.write_text(f"""Config:
  temp_folder: {tmp_path}/tmp
  backup_folder: /tmp/ignored-backups

  neo4j:
    uri: bolt://127.0.0.1:7687
    user: neo4j
    password: secret

  schema:
    - {FIXTURES}/repos-model.yml
    - {FIXTURES}/repos-model-props.yml
  prop_file: {FIXTURES}/repos-props.yml

  dataset: {dataset}
  graph_root: {graph_root}
  loading_mode: UPSERT_MODE
  max_violations: 7
{extra}""")
    return str(cfg)


def test_reference_shaped_config_parses_with_ignored_infra(tmp_path):
    ds = _dataset(tmp_path)
    cfg = LoaderConfig.from_yaml(_config_yaml(
        tmp_path, ds, str(tmp_path / "g"),
        extra="""  plugins:
    - module: icdc_dataloader_spark.plugins
      class: InferredParentCreator
      params: {parent_type: repo_owner, id_field: owner_id}
    - moduel: broken_typo_entry
      class: X
""",
    ))
    assert cfg.dataset == ds
    assert len(cfg.schema_files) == 2 and cfg.prop_file.endswith("repos-props.yml")
    assert cfg.max_violations == 7
    assert cfg.loading_mode == UPSERT_MODE
    # infra keys accepted, surfaced as ignored — never a parse error
    assert "neo4j" in cfg.ignored and "backup_folder" in cfg.ignored
    assert len(cfg.plugins) == 1  # malformed 'moduel' entry skipped
    assert cfg.plugins[0].class_name == "InferredParentCreator"
    assert cfg.validate() == []


def test_cli_overrides_beat_config_file(tmp_path):
    ds = _dataset(tmp_path)
    cfgfile = _config_yaml(tmp_path, ds, str(tmp_path / "g"))
    args = cli.build_parser().parse_args(
        [cfgfile, "-m", "NEW_MODE", "-M", "3", "-c"]
    )
    cfg = LoaderConfig.from_yaml(cfgfile).merge_oncli(args)
    assert cfg.loading_mode == "NEW_MODE"
    assert cfg.max_violations == 3
    assert cfg.cheat_mode is True
    assert cfg.dataset == ds  # file value survives where no override given


def test_missing_required_fields_fail_loudly(tmp_path):
    with pytest.raises(SystemExit, match="No dataset"):
        cli.process_arguments(["--prop-file", "x.yml", "-s", "y.yml"])


def test_end_to_end_load_and_reload(spark, tmp_path):
    ds = _dataset(tmp_path)
    groot = str(tmp_path / "graph")
    cfgfile = _config_yaml(tmp_path, ds, groot)
    stats = cli.main([cfgfile], spark=spark)
    assert stats["load"]["repo_owner"]["created"] == 2
    assert stats["load"]["repo_file"]["created"] == 2
    assert stats["load"]["relationships_created"] == 2
    assert stats["load"]["missing_parents"] == 0
    # validation ran and reports were written
    assert stats["files"]["01_owners.txt"]["errors"] == 0
    assert os.path.isdir(stats["files"]["02_files.txt"]["report"])
    # reload: updates, not creates (resume from the same graph_root)
    stats2 = cli.main([cfgfile], spark=spark)
    assert stats2["load"]["repo_file"]["created"] == 0
    assert stats2["load"]["repo_file"]["updated"] == 2


def test_dry_run_validates_but_loads_nothing(spark, tmp_path):
    ds = _dataset(tmp_path)
    groot = str(tmp_path / "graph")
    cfgfile = _config_yaml(tmp_path, ds, groot)
    stats = cli.main([cfgfile, "-d"], spark=spark)
    assert stats["dry_run"] is True and "load" not in stats
    assert not os.path.isdir(os.path.join(groot, "nodes_repo_file"))
    assert stats["files"]["01_owners.txt"]["validated"] is True


def test_invalid_file_quarantined_not_loaded(spark, tmp_path):
    ds = _dataset(tmp_path)
    # a file whose lang violates the model enum -> severity=error rows
    _write_tsv(
        os.path.join(ds, "03_bad.txt"),
        ["type", "file_key", "repo", "path", "commit", "lang"],
        [["repo_file", "rX:bad", "rX", "bad", "c9", "NOT_A_LANG"]],
    )
    cfgfile = _config_yaml(tmp_path, ds, str(tmp_path / "graph"))
    stats = cli.main([cfgfile], spark=spark)
    assert any(s["file"] == "03_bad.txt" for s in stats["skipped"])
    assert stats["files"]["03_bad.txt"]["errors"] >= 1
    # the good files still loaded (per-file quarantine, not a run abort)
    assert stats["load"]["repo_file"]["created"] == 2


def test_wipe_requires_confirmation_then_wipes(spark, tmp_path):
    ds = _dataset(tmp_path)
    groot = str(tmp_path / "graph")
    cfgfile = _config_yaml(tmp_path, ds, groot)
    cli.main([cfgfile], spark=spark)
    with pytest.raises(SystemExit, match="confirm"):
        cli.main([cfgfile, "--wipe-db"], spark=spark)
    stats = cli.main([cfgfile, "--wipe-db", "-y"], spark=spark)
    assert stats["lakes_wiped"] >= 2
    # post-wipe reload created everything fresh
    assert stats["load"]["repo_owner"]["created"] == 2


def test_delete_mode_cascades(spark, tmp_path):
    ds = _dataset(tmp_path)
    groot = str(tmp_path / "graph")
    cfgfile = _config_yaml(tmp_path, ds, groot)
    cli.main([cfgfile], spark=spark)
    # delete o1 -> cascades to its exclusively-owned file r1:a
    dd = tmp_path / "deletes"
    dd.mkdir()
    _write_tsv(dd / "del.txt", ["type", "owner_id"], [["repo_owner", "o1"]])
    with pytest.raises(SystemExit, match="confirm"):
        cli.main([cfgfile, "--dataset", str(dd), "-m", DELETE_MODE],
                 spark=spark)
    stats = cli.main(
        [cfgfile, "--dataset", str(dd), "-m", DELETE_MODE, "-y"], spark=spark
    )
    assert stats["deleted"]["nodes"] == 2  # o1 + its file
    from icdc_dataloader_spark.plans.graph_loader import GraphLoader
    from icdc_dataloader_spark.repos import load_repos_model

    gl = GraphLoader(spark, groot, load_repos_model())
    assert gl.nodes("repo_owner").count() == 1
    assert gl.nodes("repo_file").count() == 1


def test_dry_run_refuses_wipe(spark, tmp_path):
    ds = _dataset(tmp_path)
    cfgfile = _config_yaml(tmp_path, ds, str(tmp_path / "graph"))
    cli.main([cfgfile], spark=spark)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main([cfgfile, "--dry-run", "--wipe-db", "-y"], spark=spark)
    # graph untouched
    assert os.path.isdir(os.path.join(str(tmp_path / "graph"), "nodes_repo_file"))


def test_max_violations_caps_report_not_gate(spark, tmp_path):
    """max_violations bounds the persisted report; the load gate counts
    UNCAPPED errors (max_violations: 0 must not load invalid files)."""
    ds = _dataset(tmp_path)
    _write_tsv(
        os.path.join(ds, "03_bad.txt"),
        ["type", "file_key", "repo", "path", "commit", "lang"],
        [["repo_file", f"rB{i}:x", f"rB{i}", "x", "c", "NOT_A_LANG"]
         for i in range(5)],
    )
    cfgfile = _config_yaml(tmp_path, ds, str(tmp_path / "graph"))
    stats = cli.main([cfgfile, "-M", "0"], spark=spark)
    assert stats["files"]["03_bad.txt"]["errors"] == 5  # uncapped count
    assert any(s["file"] == "03_bad.txt" for s in stats["skipped"])


def test_config_without_config_key_fails_cleanly(tmp_path):
    bad = tmp_path / "bad.yml"
    bad.write_text("")  # empty file
    with pytest.raises(ValueError, match="Config"):
        LoaderConfig.from_yaml(str(bad))
    bad.write_text("NotConfig:\n  x: 1\n")
    with pytest.raises(ValueError, match="Config"):
        LoaderConfig.from_yaml(str(bad))
