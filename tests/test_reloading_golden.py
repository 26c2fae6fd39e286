"""Golden-count end-to-end reload drama — the shape of the reference's
flagship test (tests/test_reloading_data.py): load a multi-level dataset
in NEW mode with wipe and assert EXACT node/relationship counts, cascade
deletes at every level of the hierarchy with exact counts, then reload
and verify the graph is fully restored (delete -> recreate across
tombstones).  Driven through the CLI so the whole user surface is under
test."""

import os

import pytest

from icdc_dataloader_spark import cli
from icdc_dataloader_spark.model import Model
from icdc_dataloader_spark.plans.graph_loader import GraphLoader


MODEL_YML = """Nodes:
  program:
    Props: [program_id, program_name]
  study:
    Props: [study_id]
  case:
    Props: [case_id]
  sample:
    Props: [sample_id]
  file:
    Props: [file_id]
Relationships:
  of_program:
    Mul: many_to_one
    Ends:
      - Src: study
        Dst: program
    Props: []
  of_study:
    Mul: many_to_one
    Ends:
      - Src: case
        Dst: study
    Props: []
  of_case:
    Mul: many_to_one
    Ends:
      - Src: sample
        Dst: case
    Props: []
  of_sample:
    Mul: many_to_one
    Ends:
      - Src: file
        Dst: sample
    Props: []
"""

PROPS_YML = """PropDefinitions:
  program_id: {Type: string, Key: true}
  program_name: {Type: string}
  study_id: {Type: string, Key: true}
  case_id: {Type: string, Key: true}
  sample_id: {Type: string, Key: true}
  file_id: {Type: string, Key: true}
"""

DEPLOY_YML = """domain: golden.example.org
rel_prop_delimiter: "$"
delimiter: "|"
type_mapping:
  string: String
  integer: Int
id_fields:
  program: program_id
  study: study_id
  case: case_id
  sample: sample_id
  file: file_id
save_parent_id: []
plurals: {}
"""

# 1 program, 2 studies, 4 cases, 8 samples, 16 files = 31 nodes, 30 edges
N_NODES = 31
N_RELS = 30


def _write_tsv(path, header, rows):
    with open(path, "w") as fh:
        fh.write("\t".join(header) + "\n")
        for r in rows:
            fh.write("\t".join(r) + "\n")
    return str(path)


@pytest.fixture()
def env(tmp_path):
    model_f = tmp_path / "model.yml"
    model_f.write_text(MODEL_YML)
    props_f = tmp_path / "model-props.yml"
    props_f.write_text(PROPS_YML)
    deploy_f = tmp_path / "props.yml"
    deploy_f.write_text(DEPLOY_YML)

    ds = tmp_path / "dataset"
    ds.mkdir()
    _write_tsv(ds / "01_program.txt", ["type", "program_id", "program_name"],
               [["program", "P1", "Golden"]])
    _write_tsv(ds / "02_study.txt", ["type", "study_id", "program.program_id"],
               [["study", f"S{i}", "P1"] for i in range(1, 3)])
    _write_tsv(ds / "03_case.txt", ["type", "case_id", "study.study_id"],
               [["case", f"C{i}", f"S{(i - 1) // 2 + 1}"] for i in range(1, 5)])
    _write_tsv(ds / "04_sample.txt", ["type", "sample_id", "case.case_id"],
               [["sample", f"M{i}", f"C{(i - 1) // 2 + 1}"] for i in range(1, 9)])
    _write_tsv(ds / "05_file.txt", ["type", "file_id", "sample.sample_id"],
               [["file", f"F{i}", f"M{(i - 1) // 2 + 1}"] for i in range(1, 17)])

    cfg = tmp_path / "config.yml"
    cfg.write_text(f"""Config:
  temp_folder: {tmp_path}/tmp
  schema:
    - {model_f}
    - {props_f}
  prop_file: {deploy_f}
  dataset: {ds}
  graph_root: {tmp_path}/graph
  loading_mode: NEW_MODE
""")
    model = Model.from_yaml([str(model_f), str(props_f)], str(deploy_f))
    return {"cfg": str(cfg), "root": str(tmp_path / "graph"), "model": model,
            "ds": str(ds)}


def _counts(spark, env):
    gl = GraphLoader(spark, env["root"], env["model"])
    nodes = sum(
        gl.nodes(t).count() for t in gl._node_lakes
    )
    rels = gl.edges().count() if gl._edge_lake is not None else 0
    return nodes, rels


def test_golden_counts_cascades_and_reload(spark, env):
    # initial NEW-mode load: exact created counts per type
    stats = cli.main([env["cfg"]], spark=spark)
    load = stats["load"]
    assert load["program"]["created"] == 1
    assert load["study"]["created"] == 2
    assert load["case"]["created"] == 4
    assert load["sample"]["created"] == 8
    assert load["file"]["created"] == 16
    assert load["relationships_created"] == N_RELS
    assert load["missing_parents"] == 0
    assert _counts(spark, env) == (N_NODES, N_RELS)

    # cascade level by level (reference asserts exact counts per delete)
    gl = GraphLoader(spark, env["root"], env["model"])
    # delete one case -> 1 case + 2 samples + 4 files; 7 edges vanish
    n, r = gl.delete_cascade("case", ["C1"])
    assert (n, r) == (7, 7)
    assert _counts(spark, env) == (N_NODES - 7, N_RELS - 7)
    # delete one study -> study + its remaining case subtree (S1 had C1, C2;
    # C1 already gone): 1 study + 1 case + 2 samples + 4 files = 8; 8 edges
    n, r = gl.delete_cascade("study", ["S1"])
    assert (n, r) == (8, 8)
    assert _counts(spark, env) == (N_NODES - 15, N_RELS - 15)
    # delete the program -> everything else goes
    n, r = gl.delete_cascade("program", ["P1"])
    assert (n, r) == (N_NODES - 15, N_RELS - 15)
    assert _counts(spark, env) == (0, 0)

    # reload the same dataset: full graph restored (delete -> recreate
    # lineage reset across tombstones), created counts exact again
    stats2 = cli.main([env["cfg"]], spark=spark)
    load2 = stats2["load"]
    assert load2["file"]["created"] == 16 and load2["case"]["created"] == 4
    assert load2["relationships_created"] == N_RELS
    assert _counts(spark, env) == (N_NODES, N_RELS)


def test_duplicate_file_in_new_mode_surfaces_conflict(spark, env):
    cli.main([env["cfg"]], spark=spark)
    # a second NEW-mode load of the same data: every node already exists.
    # The reference raises and aborts; the set engine quarantines per key
    # and reports — existing rows stand untouched.
    stats = cli.main([env["cfg"]], spark=spark)
    load = stats["load"]
    assert load["file"]["created"] == 0
    assert _counts(spark, env) == (N_NODES, N_RELS)
