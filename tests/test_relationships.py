"""J2 parent resolve, J3 multiplicity, J4/J5 edge merge, J8 interval join,
as-of join — semantics mirrored from the reference (file:line in module)."""

from pyspark.sql import functions as F

from icdc_dataloader_spark.operators import relationships as R


def test_resolve_parents_multivalue_and_missing(spark):
    children = spark.createDataFrame(
        [("c1", "p1 | p2"), ("c2", " p1 "), ("c3", "pX"), ("c4", None), ("c5", "")],
        "child_id string, owner string",
    )
    parents = spark.createDataFrame([("p1",), ("p2",)], "owner_id string")
    res = R.resolve_parents(
        children, parents, "owner", "owner_id", "owned_by", "child_id"
    )
    edges = {(r["child_id"], r["parent_id"]) for r in res["edges"].collect()}
    # multi-valued pointer -> multiple edges (data_loader.py:973-975)
    assert edges == {("c1", "p1"), ("c1", "p2"), ("c2", "p1")}
    missing = {(r["child_id"], r["parent_id"]) for r in res["missing"].collect()}
    assert missing == {("c3", "pX")}


def test_one_to_one_conflicts(spark):
    edges = spark.createDataFrame(
        [("c1", "r", "p1"), ("c2", "r", "p1"), ("c3", "r", "p2")],
        "child_id string, rel_type string, parent_id string",
    )
    out = R.one_to_one_conflicts(edges).collect()
    assert len(out) == 1 and out[0]["parent_id"] == "p1" and out[0]["n_children"] == 2


def test_merge_edges_reparent(spark):
    cur = spark.createDataFrame(
        [("c1", "owned_by", "pOLD", 1)],
        "child_id string, rel_type string, parent_id string, _seq long",
    )
    staged = spark.createDataFrame(
        [("c1", "owned_by", "pNEW", 5), ("c2", "owned_by", "p2", 6)],
        "child_id string, rel_type string, parent_id string, _seq long",
    )
    out = {
        (r["child_id"], r["parent_id"]) for r in R.merge_edges(cur, staged).collect()
    }
    # J4: old edge replaced, single-parent invariant kept (data_loader.py:1076-1085)
    assert out == {("c1", "pNEW"), ("c2", "p2")}


def test_interval_join_visit_cycle_semantics(spark):
    """FIXTURES F5 mirroring visit_creator.py:99-173."""
    cycles = spark.createDataFrame(
        [
            ("case1", "cyc1", "2020-01-10", "2020-01-20"),
            ("case1", "cyc2", "2020-01-21", None),  # open end
            ("case2", "cyc3", "2020-03-01", "2020-03-10"),
        ],
        "case_id string, cycle_id string, start_date string, end_date string",
    )
    visits = spark.createDataFrame(
        [
            ("case1", "2020-01-15"),  # inside cyc1
            ("case1", "2020-01-05"),  # 5 days before first cycle -> cyc1 (PREDATE=7)
            ("case1", "2020-01-01"),  # 9 days before -> no match (fallback)
            ("case1", "2020-06-01"),  # inside open-ended cyc2
            ("case2", "2020-03-05"),  # inside cyc3
            ("case1", "2020-01-21"),  # boundary: first day of cyc2
        ],
        "case_id string, visit_date string",
    )
    out = R.interval_join_visits_to_cycles(visits, cycles)
    got = {
        (r["case_id"], str(r["visit_date"])): r["cycle_id"] for r in out.collect()
    }
    assert got[("case1", "2020-01-15")] == "cyc1"
    assert got[("case1", "2020-01-05")] == "cyc1"
    assert got[("case1", "2020-01-01")] is None
    assert got[("case1", "2020-06-01")] == "cyc2"
    assert got[("case2", "2020-03-05")] == "cyc3"
    assert got[("case1", "2020-01-21")] == "cyc2"
    assert out.count() == 6


def test_as_of_join(spark):
    left = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 11, 250), ("u2", 20, 50)],
        "user string, lid long, lts long",
    )
    right = spark.createDataFrame(
        [("u1", 1, 100), ("u1", 2, 200), ("u2", 3, 60)],
        "user string, rid long, rts long",
    )
    out = R.as_of_join(
        left, right, keys=["user"], left_ts="lts", right_ts="rts",
        right_value_cols=["rid"],
    )
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    # equal ts matches (non-strict): lts=100 picks rid=1 (rts=100)
    assert got == {10: 1, 11: 2, 20: None}

    strict = R.as_of_join(
        left, right, keys=["user"], left_ts="lts", right_ts="rts",
        right_value_cols=["rid"], strict=True,
    )
    got_s = {r["lid"]: r["asof_rid"] for r in strict.collect()}
    assert got_s == {10: None, 11: 2, 20: None}


def test_interval_join_matched_visit_with_null_column_not_duplicated(spark):
    """A matched visit carrying a NULL payload column must appear ONCE —
    the unmatched re-attach anti-join must be null-safe."""
    visits = spark.createDataFrame(
        [("c1", "2024-01-10", "v1", None)],
        "case_id string, visit_date string, visit_id string, notes string",
    )
    cycles = spark.createDataFrame(
        [("c1", "cy1", "2024-01-01", "2024-02-01")],
        "case_id string, cycle_id string, start_date string, end_date string",
    )
    out = R.interval_join_visits_to_cycles(visits, cycles).collect()
    assert len(out) == 1
    assert out[0]["cycle_id"] == "cy1" and out[0]["notes"] is None
