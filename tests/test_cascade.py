"""J6 cascade delete fixpoint: diamond parentage must NOT over-delete
(reference rule: only children with no other parent join the cascade,
data_loader.py:843-844; golden-count shape tests/test_reloading_data.py)."""

from icdc_dataloader_spark.operators.cascade import (
    cascade_delete_counts,
    cascade_delete_keys,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "child_id string, parent_id string")


def test_linear_cascade(spark):
    edges = _edges(spark, [("b", "a"), ("c", "b"), ("d", "c")])
    seeds = spark.createDataFrame([("a",)], "node_id string")
    got = {r["node_id"] for r in cascade_delete_keys(edges, seeds).collect()}
    assert got == {"a", "b", "c", "d"}


def test_diamond_no_over_delete(spark):
    #    a     x
    #    |    /
    #    b   /
    #     \ /
    #      c        c has parents {b, x}: deleting a kills b but NOT c
    edges = _edges(spark, [("b", "a"), ("c", "b"), ("c", "x")])
    seeds = spark.createDataFrame([("a",)], "node_id string")
    got = {r["node_id"] for r in cascade_delete_keys(edges, seeds).collect()}
    assert got == {"a", "b"}


def test_diamond_both_parents_deleted(spark):
    # deleting both roots releases the diamond child
    edges = _edges(spark, [("b", "a"), ("c", "a"), ("d", "b"), ("d", "c")])
    seeds = spark.createDataFrame([("a",)], "node_id string")
    got = {r["node_id"] for r in cascade_delete_keys(edges, seeds).collect()}
    assert got == {"a", "b", "c", "d"}


def test_counts(spark):
    edges = _edges(spark, [("b", "a"), ("c", "b"), ("c", "x")])
    seeds = spark.createDataFrame([("a",)], "node_id string")
    n_nodes, n_rels = cascade_delete_counts(edges, seeds)
    assert (n_nodes, n_rels) == (2, 2)  # {a,b}; edges (b,a) and (c,b)
