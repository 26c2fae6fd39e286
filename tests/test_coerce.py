"""Coercion parity: pinned reference cases (tests/test_loader.py:79-114 in the
reference) + property test native == parity-UDF == pure-Python."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from icdc_dataloader_spark.functions import coerce

PINNED_BOOL = [
    ("abc132", None),
    ("yes", True),
    ("YeS", True),
    ("YeS13", True),  # substring match
    ("no", False),
    ("No", False),
    ("No33", False),
    ("Normal", False),  # 'no' substring — reference quirk, test_loader.py:94-95
    ("true", True),
    ("FALSE", False),
    ("ltf", None),  # validation accepts ltf, coercion does NOT
    (None, None),
    ("", None),
]

PINNED_INT = [
    (" Normal ", None),
    (" 13 ", 13),
    (" 12 Normal ", None),
    ("1.5", None),
    ("-7", -7),
    ("+7", 7),
    ("1_000", 1000),  # Python int() accepts grouped underscores
    ("1__0", None),
    ("_1", None),
    (None, None),
]

PINNED_FLOAT = [
    (" Normal ", None),
    (" 1.5 Normal ", None),
    (" 1.5 ", 1.5),
    (" 15 ", 15.0),
    ("1e3", 1000.0),
    (".5", 0.5),
    ("5.", 5.0),
    ("-2.5e-1", -0.25),
    ("inf", float("inf")),
    ("-Infinity", float("-inf")),
    (None, None),
]


def _run_expr(spark, values, expr_fn):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(values)), "v": pd.Series(values, dtype="object")}),
        schema="i long, v string",
    )
    rows = df.select("i", expr_fn(F.col("v")).alias("out")).orderBy("i").collect()
    return [r["out"] for r in rows]


def test_boolean_pinned(spark):
    vals = [v for v, _ in PINNED_BOOL]
    assert _run_expr(spark, vals, coerce.boolean_expr) == [e for _, e in PINNED_BOOL]


def test_boolean_matches_python(spark):
    vals = [v for v, _ in PINNED_BOOL]
    for v, expected in PINNED_BOOL:
        assert coerce.py_coerce(v, "Boolean") == expected


def test_int_pinned(spark):
    vals = [v.strip() if isinstance(v, str) else v for v, _ in PINNED_INT]
    # both raw and stripped should agree with Python int()
    raw = [v for v, _ in PINNED_INT]
    assert _run_expr(spark, raw, coerce.int_expr) == [e for _, e in PINNED_INT]
    for v, e in PINNED_INT:
        assert coerce.py_coerce(v, "Int") == e


def test_float_pinned(spark):
    raw = [v for v, _ in PINNED_FLOAT]
    got = _run_expr(spark, raw, coerce.float_expr)
    for g, (_, e) in zip(got, PINNED_FLOAT):
        if e is None:
            assert g is None
        else:
            assert g == pytest.approx(e)
    for v, e in PINNED_FLOAT:
        if e is None:
            assert coerce.py_coerce(v, "Float") is None
        else:
            assert coerce.py_coerce(v, "Float") == pytest.approx(e)


def test_array_json_parity(spark):
    cases = [
        (" a | b |  | c ", '["a", "b", "c"]'),
        ("x", '["x"]'),
        ("", "[]"),
        ('he said "hi" | b\\c', '["he said \\"hi\\"", "b\\\\c"]'),
        (None, None),
    ]
    got = _run_expr(spark, [v for v, _ in cases], coerce.array_json_expr)
    assert got == [e for _, e in cases]
    for v, e in cases:
        assert coerce.py_coerce(v, "Array") == e


# --- property tests: native expression == pure Python semantics -------------

corpus = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20
)


@settings(max_examples=30, deadline=None)
@given(st.lists(corpus, min_size=1, max_size=50))
def test_boolean_property(spark, values):
    got = _run_expr(spark, values, coerce.boolean_expr)
    exp = [coerce.py_coerce(v, "Boolean") for v in values]
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            corpus,
            st.integers(-(10**12), 10**12).map(str),
            st.floats(allow_nan=False).map(str),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_int_property(spark, values):
    got = _run_expr(spark, values, coerce.int_expr)
    exp = [coerce.py_coerce(v, "Int") for v in values]
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(corpus, st.floats(allow_nan=False).map(str)),
        min_size=1,
        max_size=50,
    )
)
def test_float_property(spark, values):
    got = _run_expr(spark, values, coerce.float_expr)
    exp = [coerce.py_coerce(v, "Float") for v in values]
    for g, e in zip(got, exp):
        if e is None:
            assert g is None
        else:
            assert g == pytest.approx(e, nan_ok=True)


def test_parity_udfs(spark):
    """Arrow-batched parity UDFs agree with the native expressions."""
    vals = [v for v, _ in PINNED_BOOL if v is not None] + ["x", "none", "TRUEno"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    rows = (
        df.select(
            "i",
            coerce.boolean_expr(F.col("v")).alias("native"),
            coerce.parity_boolean(F.col("v")).alias("parity"),
        )
        .orderBy("i")
        .collect()
    )
    for r in rows:
        assert r["native"] == r["parity"]
