"""Identity parity: pinned UUID5 (reference tests/test_loader.py:65-66),
signature formats (tests/test_loader.py:57-60)."""

from pyspark.sql import functions as F

from icdc_dataloader_spark.functions import identity


def test_get_uuid_pinned():
    # reference tests/test_loader.py:65-66
    assert (
        identity.get_uuid("caninecommons.cancer.gov", "case", "123")
        == "f0cf40a7-3cdb-51fe-a596-e29e40123f56"
    )


def test_get_signature():
    # reference tests/test_loader.py:57-60
    assert identity.get_signature({}) == "{  }"
    assert identity.get_signature({"key1": "value1"}) == "{ key1: value1 }"
    assert (
        identity.get_signature({"key1": "value1", "key2": "value2"})
        == "{ key1: value1, key2: value2 }"
    )
    # parent pointers excluded (data_loader.py:495)
    assert (
        identity.get_signature({"cohort.cohort_id": "x", "a": "1"}) == "{ a: 1 }"
    )


def test_uuid5_udf_matches_python(spark):
    df = spark.createDataFrame(
        [("case", "123"), ("case", "456"), ("study", "abc"), ("case", None)],
        "node_type string, sig string",
    )
    udf = identity.make_uuid5_udf("caninecommons.cancer.gov")
    rows = df.select("node_type", "sig", udf("node_type", "sig").alias("u")).collect()
    for r in rows:
        if r["sig"] is None:
            assert r["u"] is None
        else:
            assert r["u"] == identity.get_uuid(
                "caninecommons.cancer.gov", r["node_type"], r["sig"]
            )
    pinned = {r["sig"]: r["u"] for r in rows}
    assert pinned["123"] == "f0cf40a7-3cdb-51fe-a596-e29e40123f56"


def test_signature_expr_matches_python(spark):
    df = spark.createDataFrame(
        [("v1", "v2", None), ("a", None, "c")], "k1 string, k2 string, k3 string"
    )
    rows = df.select(
        identity.signature_expr(["k1", "k2", "k3"]).alias("sig"), "k1", "k2", "k3"
    ).collect()
    for r in rows:
        exp = identity.get_signature({"k1": r["k1"], "k2": r["k2"], "k3": r["k3"]})
        assert r["sig"] == exp


def test_is_parent_pointer():
    assert identity.is_parent_pointer("cohort.cohort_id")
    assert not identity.is_parent_pointer("cohort_id")
    assert not identity.is_parent_pointer("a.b.c")
