"""Mirror of the driver's correctness gate: run every queries() entry and its
oracle_sql() side-by-side on the same parquet, compare row count + values
(column-name-sorted, order-insensitive) — at sf0.001 for speed; the driver
runs sf0.01."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql)


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _key(t):
    return tuple((v is None, str(v)) for v in t)


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(row[c]) for c in cols) for row in df.collect()), key=_key
    ), cols


def _duck_rows(sql):
    res = _duck(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = sorted(
        (tuple(_norm(r[i]) for i in order) for r in res.fetchall()), key=_key
    )
    return rows, sorted(names)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_vs_oracle(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    got, got_cols = _spark_rows(df)
    exp, exp_cols = _duck_rows(entrymod.oracle_sql()[name])
    assert got_cols == exp_cols, f"{name}: column names differ"
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    assert got == exp, f"{name}: values differ\nspark[:3]={got[:3]}\nduck[:3]={exp[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize(
    "name", sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))
)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
