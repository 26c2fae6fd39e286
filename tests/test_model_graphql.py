"""Model → GraphQL emitter parity (reference model-converter.py) and the
ES _bulk NDJSON export shape (reference es_loader.py streaming_bulk)."""

import json

from icdc_dataloader_spark.model import Model, PropDef
from icdc_dataloader_spark.model_graphql import model_to_graphql, strip_annotations


def _model():
    return Model(
        nodes={
            "case": {
                "case_id": PropDef("case_id", "String", required=True),
                "age": PropDef("age", "Int"),
                "enrolled": PropDef("enrolled", "Date"),
                "meta": PropDef("meta", "Object"),
                "ssn": PropDef("ssn", "String", private=True),
            },
            "visit": {"visit_id": PropDef("visit_id", "String")},
        },
        relationships={},
        domain="repos.example.org",
        id_fields={"case": "case_id"},
    )


def test_types_emitted_public_only_with_scalar_mapping():
    text = model_to_graphql(_model(), query_block="type Query {\n  case: case\n}\n")
    assert "type case {" in text and "type visit {" in text
    assert "  case_id: String" in text
    assert "  age: Int" in text
    # Date and Object collapse to String (model-converter.py:71-76)
    assert "  enrolled: String" in text and "  meta: String" in text
    # private props never reach the public schema
    assert "ssn" not in text
    # custom query block appended verbatim
    assert text.rstrip().endswith("}")
    assert "type Query {" in text


def test_strip_annotations_multiline_parenthesis_tracking():
    src = (
        "type case {\n"
        "  case_id: String @filter(\n"
        "     op: EQ,\n"
        "     val: 1)\n"
        "  age: Int\n"
        "}\n"
    )
    doc = strip_annotations(src)
    assert "@" not in doc and "op: EQ" not in doc
    assert "  case_id: String \n" in doc and "  age: Int\n" in doc


def test_export_bulk_ndjson_pairs(spark, tmp_path):
    from pyspark.sql import functions as F

    from icdc_dataloader_spark.plans.export import export_index
    from icdc_dataloader_spark.plans.merge import merge_into
    from icdc_dataloader_spark.repos import create_repos_table

    lake = create_repos_table(str(tmp_path / "t"), n_buckets=2)
    b = spark.createDataFrame(
        [("r1", "a", "c1", "py", "hello", 1, "upsert"),
         ("r2", "b", "c2", "go", "world", 2, "upsert")],
        "repo string, path string, commit string, lang string, content string,"
        " _seq long, _op string",
    ).withColumn("content_sha256", F.sha2("content", 256))
    merge_into(spark, lake, b, batch_id="x")

    out = str(tmp_path / "bulk")
    n = export_index(spark, lake, out, doc_id_col="repo",
                     bulk_format=True, index_name="repos")
    assert n == 2
    import glob

    # the _bulk wire format: action line then source line, alternating
    raw = []
    for part in sorted(glob.glob(out + "/part-*")):
        with open(part) as fh:
            raw.extend(l for l in fh.read().splitlines() if l)
    assert len(raw) == 4
    parsed = [json.loads(l) for l in raw]
    actions = [p for p in parsed if "index" in p and set(p) == {"index"}]
    docs = [p for p in parsed if "index" not in p]
    assert len(actions) == 2 and len(docs) == 2
    # every action line is immediately followed by a doc line
    for i, p in enumerate(parsed):
        if set(p) == {"index"}:
            assert "repo" in parsed[i + 1]
    assert {a["index"]["_id"] for a in actions} == {"r1", "r2"}
    assert all(a["index"]["_index"] == "repos" for a in actions)
    assert {d["content"] for d in docs} == {"hello", "world"}
    assert all("_id" not in d for d in docs)


def test_strip_argless_annotation_does_not_swallow_lines():
    src = "type case {\n  case_id: String @deprecated\n  age: Int\n}\n"
    doc = strip_annotations(src)
    assert "  age: Int\n" in doc and "}\n" in doc
    assert "@" not in doc


def test_p7_public_projection_drops_private_props(spark):
    from icdc_dataloader_spark.sources.tsv import public_projection

    model = _model()
    df = spark.createDataFrame(
        [("c1", 4, "secret")], "case_id string, age int, ssn string"
    )
    out = public_projection(df, "case", model)
    assert "ssn" not in out.columns
    assert set(out.columns) == {"case_id", "age"}
