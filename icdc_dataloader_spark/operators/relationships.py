"""Relationship resolution: the set-oriented form of the reference's
per-row Cypher lookups (SURVEY.md §2.4).

- J2 parent resolve: the reference loops rows and runs one MATCH per
  parent pointer value (collect_relationships, data_loader.py:965-1029);
  here: explode the (possibly multi-valued) pointer column and equi-join
  the parent table (broadcast when dimension-sized).
- J3 one-to-one conflict: parent already linked to a different child
  (data_loader.py:1031-1049) -> groupBy having countDistinct(child) > 1.
- J4 re-parent: many_to_one/one_to_one upsert replaces the old edge when
  the parent changed (data_loader.py:1052-1085) -> LWW on (child, rel).
- J8 interval join: visit -> containing cycle, ordered by cycle start,
  <=PREDATE days before the first cycle attaches to it, open end date =
  9999-12-31, no match -> fallback (visit_creator.py:99-173, PREDATE=7
  at :19-20) -> range join + row_number.
- as-of join: generalization used for binlog alignment — latest right row
  with ts <= left ts per key, implemented WITHOUT a join: union both
  sides, one window sort per key, ``last_value(..., ignorenulls)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resolve_parents(
    child_df: DataFrame,
    parent_df: DataFrame,
    pointer_col: str,
    parent_key: str,
    rel_type: str,
    child_id_col: str,
    delimiter: str = "|",
    broadcast_parents: bool | None = None,
) -> dict:
    """J2: explode multi-valued parent pointers, resolve against parents.

    Returns {'edges': DataFrame(child_id, rel_type, parent_id),
             'missing': DataFrame(child_id, parent_id)} — missing parents
    are the MISSING_PARENT plugin event feed (data_loader.py:988-1001).

    ``broadcast_parents``: None (default) leaves the join strategy to
    Catalyst/AQE — at 100x scale the parent table may not fit in driver
    memory, so an unconditional hint would OOM instead of degrading to a
    shuffle join.  Pass True only when the caller KNOWS the side is
    dimension-sized (GraphLoader gates this on manifest row counts).
    """
    exploded = (
        child_df.filter(
            F.col(pointer_col).isNotNull() & (F.col(pointer_col) != "")
        )
        .select(
            F.col(child_id_col).alias("child_id"),
            F.explode(
                F.filter(
                    F.transform(
                        F.split(F.col(pointer_col), "[" + delimiter + "]"),
                        lambda x: F.trim(x),
                    ),
                    lambda x: x != "",
                )
            ).alias("parent_id"),
        )
    )
    parents = parent_df.select(F.col(parent_key).alias("parent_id")).distinct()
    if broadcast_parents:
        parents = F.broadcast(parents)
    edges = exploded.join(parents, "parent_id", "inner").select(
        "child_id", F.lit(rel_type).alias("rel_type"), "parent_id"
    )
    missing = exploded.join(parents, "parent_id", "left_anti")
    return {"edges": edges, "missing": missing}


def one_to_one_conflicts(edges: DataFrame) -> DataFrame:
    """J3: parents with more than one distinct child for a one_to_one rel."""
    return (
        edges.groupBy("parent_id", "rel_type")
        .agg(F.countDistinct("child_id").alias("n_children"))
        .filter(F.col("n_children") > 1)
    )


def merge_edges(
    current_edges: DataFrame,
    staged_edges: DataFrame,
    seq_col: str = "_seq",
    many_to_one: bool = True,
) -> DataFrame:
    """J4+J5: edge upsert with re-parenting.

    For many_to_one/one_to_one relationships the key is (child_id,
    rel_type): a newer edge replaces the old parent (the reference deletes
    the old edge, remove_old_relationship data_loader.py:1076-1085).  For
    many_to_many the key includes parent_id (one row per pair).
    """
    keys = (
        ["child_id", "rel_type"]
        if many_to_one
        else ["child_id", "rel_type", "parent_id"]
    )
    unioned = current_edges.unionByName(staged_edges)
    cols = [c for c in unioned.columns]
    return (
        unioned.groupBy(*keys)
        .agg(F.max_by(F.struct(*cols), F.col(seq_col)).alias("_w"))
        .select("_w.*")
    )


def interval_join_visits_to_cycles(
    visits: DataFrame,
    cycles: DataFrame,
    case_col: str = "case_id",
    visit_date: str = "visit_date",
    cycle_start: str = "start_date",
    cycle_end: str = "end_date",
    cycle_id: str = "cycle_id",
    predate_days: int = 7,
    open_end: str = "9999-12-31",
) -> DataFrame:
    """J8 (visit_creator.py:99-173): assign each visit to a cycle.

    - match: start - (predate if first cycle) <= visit_date <= coalesce(end, open)
    - multiple matches -> first cycle by start date (ORDER BY start,
      visit_creator.py:102)
    - no match -> cycle_id NULL (caller falls back to the case edge,
      visit_creator.py:166-173)

    Plan: equi-join on case + range predicate, then row_number per visit.
    At scale the equi key keeps this a hash join; cycles-per-case is small.
    """
    # ties on start date broken by cycle id => deterministic under any
    # partitioning (the reference relies on Neo4j's ORDER BY stability)
    w_first = Window.partitionBy(case_col).orderBy(
        F.col(cycle_start).asc(), F.col(cycle_id).asc()
    )
    c = cycles.select(
        F.col(case_col).alias("_case"),
        F.col(cycle_id).alias("cycle_id"),
        F.col(cycle_start).cast("date").alias("_start"),
        F.coalesce(F.col(cycle_end).cast("date"), F.lit(open_end).cast("date")).alias(
            "_end"
        ),
        (F.row_number().over(w_first) == 1).alias("_is_first"),
    )
    v = visits.select(
        F.col(case_col).alias("_case"),
        F.col(visit_date).cast("date").alias("_vdate"),
        "*",
    ).drop(case_col, visit_date)
    lower = F.when(
        F.col("_is_first"), F.date_sub(F.col("_start"), predate_days)
    ).otherwise(F.col("_start"))
    joined = v.join(c, "_case", "left").filter(
        (F.col("_vdate") >= lower) & (F.col("_vdate") <= F.col("_end"))
        | F.col("cycle_id").isNull()
    )
    # one cycle per VISIT ROW: the pick window carries the visit's full
    # identity (every visit column), so two distinct visits sharing a
    # (case, date) each keep their own match — partitioning on
    # (case, date) alone silently dropped one of them (the reference
    # assigns per visit node, visit_creator.py:99-173).  Exact full-row
    # duplicates still collapse to one row, documented.
    v_cols = [f.name for f in v.schema.fields]
    pick = Window.partitionBy(*v_cols).orderBy(
        F.col("_start").asc_nulls_last(), F.col("cycle_id").asc_nulls_last()
    )
    out = (
        joined.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_first", "_start", "_end")
    )
    # visits whose case had cycles but none matched: re-attach as unmatched,
    # keyed by the same full visit identity.  NULL-SAFE equality: a plain
    # equi anti-join treats NULL payload columns as non-matching, so a
    # matched visit with any NULL column would be re-emitted a second time
    # with cycle_id NULL.
    matched_keys = out.select(*v_cols).distinct()
    anti_cond = None
    for col in v_cols:
        term = v[col].eqNullSafe(matched_keys[col])
        anti_cond = term if anti_cond is None else (anti_cond & term)
    unmatched = (
        v.join(matched_keys, anti_cond, "left_anti")
        .withColumn("cycle_id", F.lit(None).cast(c.schema["cycle_id"].dataType))
    )
    return out.unionByName(unmatched, allowMissingColumns=True).withColumnsRenamed(
        {"_case": case_col, "_vdate": visit_date}
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Latest right row with right_ts <= left_ts (< if strict), per key.

    Join-free plan: union both sides tagged, sort within key by (ts, side)
    with one window, carry the last seen right values via
    ``last(ignorenulls)``.  One shuffle on the key — no range-join blow-up,
    skew handled by AQE.  (Spark lacks a native as-of join; this is the
    composition route, pd.merge_asof per group being the UDF fallback.)
    """
    l_cols = [c for c in left.columns]
    lhs = left.select(
        *l_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
    )
    rhs = right.select(
        *[
            F.col(k) if k in right.columns else F.lit(None).alias(k)
            for k in keys
        ],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
    ).select(*l_cols, "_ts", "_side", *[f"_r_{c}" for c in right_value_cols])
    unioned = lhs.unionByName(rhs)
    # ties on (key, ts) among right rows are broken by the value columns so
    # the carried row is deterministic under any partitioning
    tiebreak = [F.col(f"_r_{c}").asc_nulls_first() for c in right_value_cols]
    if strict:
        # right rows at equal ts sort AFTER left rows => excluded by the -1 bound
        order = [F.col("_ts").asc(), F.col("_side").desc(), *tiebreak]
    else:
        order = [F.col("_ts").asc(), F.col("_side").asc(), *tiebreak]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned.select(
        *l_cols,
        "_ts",
        "_side",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side", "_ts")
