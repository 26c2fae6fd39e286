"""TSV source + prepare_nodes: the reference's prepare_node pinned behaviors
(tests/test_loader.py:62-114 in the reference) reproduced set-oriented."""

import os

import pytest
from pyspark.sql import functions as F

from icdc_dataloader_spark.functions.identity import get_uuid
from icdc_dataloader_spark.model import Model, PropDef, RelDef, RelEnd
from icdc_dataloader_spark.sources import tsv


@pytest.fixture(scope="module")
def case_model():
    """Mirror of the reference ICDC model slice used by its unit tests."""
    return Model(
        nodes={
            "case": {
                "case_id": PropDef("case_id", "String", key=True),
                "key1": PropDef("key1", "String"),
                "cohort_id": PropDef("cohort_id", "String"),
            },
            "vital_signs": {"ecg": PropDef("ecg", "Boolean")},
            "physical_exam": {"day_in_cycle": PropDef("day_in_cycle", "Int")},
            "file": {
                "file_size": PropDef("file_size", "Float"),
                "uuid": PropDef("uuid", "String"),
            },
            "cohort": {"cohort_id": PropDef("cohort_id", "String", key=True)},
        },
        relationships={
            "member_of": RelDef(
                "member_of", "many_to_one", [RelEnd("case", "cohort", "many_to_one")]
            )
        },
        domain="caninecommons.cancer.gov",
        id_fields={"case": "case_id", "cohort": "cohort_id"},
        save_parent_id=["case"],
    )


def _prep(spark, model, node_type, header, rows):
    df = spark.createDataFrame(rows, ", ".join(f"`{h}` string" for h in header))
    return tsv.prepare_nodes(df, node_type, model)


def test_uuid_synthesis_pinned(spark, case_model):
    """reference tests/test_loader.py:65-66: exact UUID5 for case 123."""
    out = _prep(
        spark, case_model, "case", ["type", "case_id", " key1 "],
        [("case", "123", " value1  ")],
    ).collect()[0]
    assert out["uuid"] == "f0cf40a7-3cdb-51fe-a596-e29e40123f56"
    assert out["key1"] == "value1"  # P1 trim of keys and values


def test_uuid_passthrough(spark, case_model):
    """uuid column present -> NO synthesis (data_loader.py:464)."""
    out = _prep(
        spark, case_model, "file", ["type", "uuid"], [("file", "123")]
    ).collect()[0]
    assert out["uuid"] == "123"


def test_parent_id_denormalization_and_clash(spark, case_model):
    """reference tests/test_loader.py:71-75."""
    out = _prep(
        spark, case_model, "case", ["type", "cohort.cohort_id"],
        [("case", "abc132")],
    ).collect()[0]
    assert out["cohort_id"] == "abc132"

    out2 = _prep(
        spark, case_model, "case", ["type", "cohort.cohort_id", "cohort_id"],
        [("case", "abc132", "def333")],
    ).collect()[0]
    assert out2["cohort_id"] == "def333"
    assert out2["cohort_cohort_id"] == "abc132"
    assert len(out2["uuid"]) == 36


def test_boolean_int_float_coercion(spark, case_model):
    got = {
        r["__v"]: r["ecg"]
        for r in _prep(
            spark, case_model, "vital_signs", ["type", "ecg", "__v"],
            [("vital_signs", v, v) for v in ["abc132", "yes", "YeS13", "Normal", "No33"]],
        ).collect()
    }
    assert got == {"abc132": None, "yes": True, "YeS13": True, "Normal": False, "No33": False}

    # marker column __v is itself trimmed by P1 => trimmed keys
    got_i = {
        r["__v"]: r["day_in_cycle"]
        for r in _prep(
            spark, case_model, "physical_exam", ["type", "day_in_cycle", "__v"],
            [("physical_exam", v, v.strip()) for v in [" Normal ", " 13 ", " 12 Normal "]],
        ).collect()
    }
    assert got_i == {"Normal": None, "13": 13, "12 Normal": None}


def test_signature_uuid_when_no_id(spark):
    model = Model(
        nodes={"thing": {"a": PropDef("a", "String"), "b": PropDef("b", "String")}},
        relationships={},
        domain="d.example.org",
    )
    out = _prep(spark, model, "thing", ["type", "a", "b"], [("thing", "1", "2")]).collect()[0]
    # no id field -> uuid from full sorted signature (data_loader.py:470)
    expected = get_uuid("d.example.org", "thing", "{ a: 1, b: 2, type: thing }")
    assert out["uuid"] == expected


def test_read_tsv_and_encoding(spark, tmp_path):
    p = str(tmp_path / "nodes.txt")
    with open(p, "w", encoding="utf-8") as fh:
        fh.write("type\tcase_id\tkey1\n")
        fh.write("case\t123\tv1\n")
        fh.write("case\t456\tv2\n")
    assert tsv.sniff_encoding(p) == "utf-8"
    df = tsv.read_tsv(spark, p)
    assert df.count() == 2 and df.columns == ["type", "case_id", "key1"]

    p2 = str(tmp_path / "latin.txt")
    with open(p2, "wb") as fh:
        fh.write("type\tname\ncase\tcaf\xe9\n".encode("windows-1252"))
    assert tsv.sniff_encoding(p2) == "windows-1252"
    df2 = tsv.read_tsv(spark, p2)
    assert df2.collect()[0]["name"] == "café"


def test_extract_edges_multivalue_and_rel_props(spark, case_model):
    df = spark.createDataFrame(
        [("case", "c1", "p1 | p2", "2020")],
        "`type` string, `case_id` string, `cohort.cohort_id` string,"
        " `member_of$since` string",
    )
    prepared = tsv.prepare_nodes(df, "case", case_model)
    edges = tsv.extract_edges(prepared, "case", case_model)
    rows = edges.collect()
    assert len(rows) == 2
    assert {r["parent_id"] for r in rows} == {"p1", "p2"}
    assert all(r["rel_type"] == "member_of" for r in rows)
    assert all(r["parent_type"] == "cohort" for r in rows)
    assert all(r["rel_props"]["since"] == "2020" for r in rows)
    node = tsv.node_projection(prepared, case_model)
    assert "cohort.cohort_id" not in node.columns
    assert "member_of$since" not in node.columns


def test_unit_companions(spark):
    model = Model(
        nodes={
            "sample": {
                "weight": PropDef("weight", "Float", has_unit=True, units=["kg", "g"]),
            }
        },
        relationships={},
    )
    out = _prep(spark, model, "sample", ["type", "weight"], [("sample", "1.5")]).collect()[0]
    assert out["weight"] == 1.5
    assert out["weight_unit"] == "kg"
    # reference sets original AFTER coercion (data_loader.py:460-462 runs on
    # the mutated obj) => original carries the coerced value
    assert out["weight_original"] == 1.5
    assert out["weight_original_unit"] == "kg"
