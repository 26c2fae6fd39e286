"""J6: recursive cascade delete as an iterative join fixpoint.

The reference BFS-deletes from seed nodes, enqueueing children that have
NO other parent (``WHERE NOT EXISTS((n)<--(m)-->())`` —
get_children_with_single_parent, data_loader.py:826-870).  Spark has no
recursive operator, so the frontier loop runs on the driver; each
iteration is two distributed joins, bounded by graph depth (shallow for
entity hierarchies).  Frontiers are localCheckpoint()-ed so the plan does
not grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cascade_delete_keys(
    edges: DataFrame,
    seed_keys: DataFrame,
    max_iterations: int = 50,
) -> DataFrame:
    """Compute the full closure of node keys to delete.

    ``edges``: (child_id, parent_id) — child points to parent (the
    reference's direction: data rows point at their parents).
    ``seed_keys``: (node_id,) roots requested for deletion.

    A child joins the delete set only when ALL of its parents are already
    in it (the reference's "no other parent" rule, data_loader.py:843-844).
    Returns DataFrame(node_id).
    """
    deleted = seed_keys.select(F.col(seed_keys.columns[0]).alias("node_id")).distinct()
    deleted = deleted.localCheckpoint()
    frontier = deleted
    for _ in range(max_iterations):
        # children with at least one parent in the frontier
        candidates = (
            edges.join(
                frontier.withColumnRenamed("node_id", "parent_id"), "parent_id"
            )
            .select(F.col("child_id").alias("node_id"))
            .distinct()
        )
        # drop candidates that still have a surviving parent
        surviving_parent = (
            edges.join(
                deleted.withColumnRenamed("node_id", "parent_id"),
                "parent_id",
                "left_anti",
            )
            .select(F.col("child_id").alias("node_id"))
            .distinct()
        )
        new_nodes = (
            candidates.join(surviving_parent, "node_id", "left_anti")
            .join(deleted, "node_id", "left_anti")
        )
        new_nodes = new_nodes.localCheckpoint()
        if new_nodes.isEmpty():
            break
        deleted = deleted.unionByName(new_nodes).localCheckpoint()
        frontier = new_nodes
    return deleted


def cascade_delete_counts(
    edges: DataFrame, seed_keys: DataFrame
) -> tuple[int, int]:
    """(nodes_deleted, relationships_deleted) — the golden-count shape of
    the reference's delete tests (tests/test_reloading_data.py:100-127)."""
    doomed = cascade_delete_keys(edges, seed_keys)
    n_nodes = doomed.count()
    as_child = edges.join(
        doomed.withColumnRenamed("node_id", "child_id"), "child_id", "left_semi"
    )
    as_parent = edges.join(
        doomed.withColumnRenamed("node_id", "parent_id"), "parent_id", "left_semi"
    )
    n_rels = as_child.unionByName(as_parent).distinct().count()
    return n_nodes, n_rels
