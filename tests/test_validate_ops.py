"""Validation operators V1-V5 unit tests, pinned to reference quirks
(icdc_schema.py:402-587; deliberate coercion/validation disagreement)."""

from pyspark.sql import functions as F

from icdc_dataloader_spark.functions import coerce
from icdc_dataloader_spark.model import Model, PropDef
from icdc_dataloader_spark.operators import validate
from icdc_dataloader_spark.repos import load_repos_model


def _model():
    return Model(
        nodes={
            "thing": {
                "name": PropDef("name", "String", required=True),
                "flag": PropDef("flag", "Boolean"),
                "n": PropDef("n", "Int", minimum=0, maximum=10),
                "x": PropDef("x", "Float", exclusive_minimum=0.0),
                "color": PropDef("color", "String", enum={"red", "blue"}),
                "tags": PropDef("tags", "Array", item_enum={"a", "b"}),
            }
        },
        relationships={},
    )


def _errors(spark, rows):
    df = spark.createDataFrame(
        rows,
        "seq long, name string, flag string, n string, x string,"
        " color string, tags string",
    )
    out = validate.validation_errors(df, "thing", _model(), row_id_col="seq")
    return {(r["row_id"], r["property"], r["reason"]) for r in out.collect()}


def test_required_and_enum_and_range(spark):
    errs = _errors(
        spark,
        [
            (1, "ok", "yes", "5", "1.5", "red", "a|b"),      # clean
            (2, "", "yes", "5", "1.5", "red", "a"),          # empty required
            (3, None, "yes", "5", "1.5", "red", "a"),        # null required
            (4, "ok", "yes", "11", "1.5", "red", "a"),       # out of range
            (5, "ok", "yes", "5", "0.0", "red", "a"),        # violates exclusiveMin
            (6, "ok", "yes", "5", "1.5", "green", "a"),      # bad enum
            (7, "ok", "yes", "5", "1.5", "red", "a|z"),      # bad array item
            (8, "ok", "yes", "abc", "1.5", "red", "a"),      # wrong int type
        ],
    )
    assert (2, "name", "value_empty") in errs
    assert (3, "name", "value_empty") in errs
    assert (4, "n", "out_of_range") in errs
    assert (5, "x", "out_of_range") in errs
    assert (6, "color", "non_permissive_value") in errs
    assert (7, "tags", "non_permissive_value") in errs
    assert (8, "n", "wrong_type") in errs
    assert not any(r[0] == 1 for r in errs)


def test_boolean_validation_vs_coercion_disagree(spark):
    """icdc_schema.py:547-551 vs data_loader.py:399-408: validation is
    word-boundary + start-anchored and accepts 'ltf'; coercion is substring.
    'Normal' coerces to False but FAILS validation; 'ltf' passes validation
    but coerces to None."""
    errs = _errors(
        spark,
        [
            (1, "ok", "Normal", "1", "1.0", "red", "a"),
            (2, "ok", "ltf", "1", "1.0", "red", "a"),
            (3, "ok", "yes please", "1", "1.0", "red", "a"),
            (4, "ok", "is yes", "1", "1.0", "red", "a"),  # not at start
        ],
    )
    assert (1, "flag", "wrong_type") in errs
    assert not any(r[0] == 2 for r in errs)  # ltf valid
    assert not any(r[0] == 3 for r in errs)  # starts with 'yes' -> valid
    assert (4, "flag", "wrong_type") in errs

    df = spark.createDataFrame([("Normal",), ("ltf",)], "v string")
    got = [r["b"] for r in df.select(coerce.boolean_expr(F.col("v")).alias("b")).collect()]
    assert got == [False, None]


def test_validate_header(spark):
    m = load_repos_model()
    cols = [
        "type", "repo", "path", "commit", "lang", "content",
        "unknown_col",                 # warn: not in model
        "repo_owner.owner_id",         # ok parent pointer
        "nonexistent.some_id",         # error: parent not in model
        "owned_by$since",              # ok rel prop
        "owned_by$bogus",              # error: prop not on relationship
    ]
    res = validate.validate_header(cols, "repo_file", m)
    warn_cols = {c for c, _ in res["warnings"]}
    err = dict(res["errors"])
    assert "unknown_col" in warn_cols
    assert err["nonexistent.some_id"] == "parent_node_not_in_model"
    assert err["owned_by$bogus"] == "relationship_prop_not_in_model"
    assert "repo_owner.owner_id" not in err

    res2 = validate.validate_header(["type", "repo"], "repo_file", m)
    missing = {c for c, r in res2["errors"] if r == "property_missing"}
    assert missing == {"path", "commit"}


def test_duplicate_id_semantics(spark):
    """V5 (data_loader.py:660-692): same id + same signature = benign;
    different signatures = error with sorted row ids."""
    df = spark.createDataFrame(
        [
            (1, "id1", "sigA"),
            (2, "id1", "sigA"),   # benign duplicate (multi-parent row)
            (3, "id2", "sigB"),
            (4, "id2", "sigC"),   # conflict
        ],
        "seq long, id string, sig string",
    )
    out = validate.duplicate_id_errors(df, ["id"], F.col("sig"), row_id_col="seq")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["id"] == "id2" and rows[0]["row_ids"] == [3, 4]
