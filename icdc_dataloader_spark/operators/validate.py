"""Validation operators V1-V8 (SURVEY.md §2.3) as DataFrame transforms.

The reference validates every file before any write (validate_files,
data_loader.py:231-265) producing a typed error relation
``(File Name, Property, Value, Reason, Line Numbers, Severity)``
(data_loader.py:388,648).  Here validation is a single-pass projection that
emits an ``errors`` DataFrame ``(row_id, property, value, reason, severity)``
— one scan regardless of how many checks a column has: every check becomes
an element of an array<struct> that is filtered and exploded.

Semantics mirrored exactly (icdc_schema.py:402-587):

- required present + non-empty (icdc_schema.py:414-424) -> reasons
  ``property_missing`` (header-level) / ``value_empty``
- Int/Float: Python-parsable, then bounds minimum/maximum/exclusive*
  (icdc_schema.py:502-545) -> ``wrong_type`` / ``out_of_range``
- Boolean VALIDATION accepts word-boundary yes/true/no/false **and ltf**,
  anchored at string start (re.match, icdc_schema.py:547-551) — deliberately
  different from the substring-based COERCION (data_loader.py:399-408);
  both quirks are preserved and tested.
- String enums -> ``non_permissive_value`` ('' passes, icdc_schema.py:568-570)
- Array items validated item-wise against the item enum (icdc_schema.py:552-560)
- duplicate-ID check (V5, data_loader.py:660-692): same id + same props
  signature = benign; differing signatures = error with line numbers.
- parent-exists (V6, data_loader.py:529-557): anti-join children vs parents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.coerce import _INT_RE, _NUM_RE, _pytrim
from ..model import Model

# Boolean VALIDATION regexes (icdc_schema.py:547-551): re.match => anchored
# at start; \b before the word allows leading non-word chars? No — re.match
# requires the match at position 0, so the first token must start the string.
_BOOL_VALID_RE = r"(?i)^(\byes\b|\btrue\b|\bno\b|\bfalse\b|\bltf\b)"

REASON_WRONG_TYPE = "wrong_type"
REASON_OUT_OF_RANGE = "out_of_range"
REASON_NON_PERMISSIVE = "non_permissive_value"
REASON_VALUE_EMPTY = "value_empty"
REASON_PROPERTY_MISSING = "property_missing"


def _err(prop: str, value: Column, reason: str, severity: str = "error") -> Column:
    return F.struct(
        F.lit(prop).alias("property"),
        value.cast("string").alias("value"),
        F.lit(reason).alias("reason"),
        F.lit(severity).alias("severity"),
    )


def _null_err() -> Column:
    return F.lit(None).cast(
        "struct<property:string,value:string,reason:string,severity:string>"
    )


def _range_violation(p, value: Column) -> Column:
    cond = F.lit(False)
    if p.minimum is not None:
        cond = cond | (value < F.lit(p.minimum))
    if p.maximum is not None:
        cond = cond | (value > F.lit(p.maximum))
    if p.exclusive_minimum is not None:
        cond = cond | (value <= F.lit(p.exclusive_minimum))
    if p.exclusive_maximum is not None:
        cond = cond | (value >= F.lit(p.exclusive_maximum))
    return cond


def validation_check_pairs(
    df: DataFrame, node_type: str, model: Model
) -> list[tuple[Column, Column]]:
    """One ``(violation_condition, error_struct)`` pair per (column, check)
    over raw string cells.  Single source of truth for the checks: the
    error-relation form (:func:`validation_error_checks`) and the hot
    ingest path's boolean form (cdc._annotate_fast — which ORs just the
    conditions, keeping the whole row-validity test inside whole-stage
    codegen) are both assembled from this list, so they cannot drift."""
    checks: list[tuple[Column, Column]] = []
    props = model.props_of(node_type)
    present = set(df.columns)

    for prop in model.required_props(node_type):
        if prop not in present:
            continue  # header-level: see validate_header
        c = F.col(prop)
        checks.append(
            (
                c.isNull() | (c.cast("string") == ""),
                _err(prop, c, REASON_VALUE_EMPTY),
            )
        )

    for name, p in props.items():
        if name not in present:
            continue
        c = F.col(name).cast("string")
        nonempty = c.isNotNull() & (c != "")
        if p.type == "Int":
            t = _pytrim(c)
            bad = nonempty & ~t.rlike(_INT_RE)
            checks.append((bad, _err(name, c, REASON_WRONG_TYPE)))
            if any(
                x is not None
                for x in (p.minimum, p.maximum, p.exclusive_minimum, p.exclusive_maximum)
            ):
                v = F.regexp_replace(t, "_", "").cast("double")
                checks.append(
                    (
                        nonempty & t.rlike(_INT_RE) & _range_violation(p, v),
                        _err(name, c, REASON_OUT_OF_RANGE),
                    )
                )
        elif p.type == "Float":
            t = _pytrim(c)
            ok = t.rlike(_NUM_RE) | t.rlike(r"(?i)^[+-]?(inf(inity)?|nan)$")
            checks.append((nonempty & ~ok, _err(name, c, REASON_WRONG_TYPE)))
            if any(
                x is not None
                for x in (p.minimum, p.maximum, p.exclusive_minimum, p.exclusive_maximum)
            ):
                v = F.regexp_replace(t, "_", "").cast("double")
                checks.append(
                    (
                        nonempty & ok & _range_violation(p, v),
                        _err(name, c, REASON_OUT_OF_RANGE),
                    )
                )
        elif p.type == "Boolean":
            checks.append(
                (
                    nonempty & ~c.rlike(_BOOL_VALID_RE),
                    _err(name, c, REASON_WRONG_TYPE),
                )
            )
        elif p.enum is not None:
            checks.append(
                (
                    nonempty & ~c.isin(*sorted(p.enum)),
                    _err(name, c, REASON_NON_PERMISSIVE),
                )
            )
        elif p.type == "Array" and p.item_enum is not None:
            items = F.filter(
                F.transform(
                    F.split(c, "[" + model.delimiter + "]"),
                    lambda x: F.trim(x),
                ),
                lambda x: x != "",
            )
            bad_item = F.array_except(items, F.array(*[F.lit(v) for v in sorted(p.item_enum)]))
            checks.append(
                (
                    nonempty & (F.size(bad_item) > 0),
                    _err(name, F.element_at(bad_item, 1), REASON_NON_PERMISSIVE),
                )
            )
    return checks


def validation_error_checks(df: DataFrame, node_type: str, model: Model) -> list[Column]:
    """One struct-or-null expression per (column, check) over raw string cells."""
    return [
        F.when(cond, err).otherwise(_null_err())
        for cond, err in validation_check_pairs(df, node_type, model)
    ]


def validation_errors(
    df: DataFrame, node_type: str, model: Model, row_id_col: str = "seq"
) -> DataFrame:
    """All V2/V3 violations in one scan.

    Output: (row_id, property, value, reason, severity).
    """
    checks = validation_error_checks(df, node_type, model)
    if not checks:
        return df.sparkSession.createDataFrame(
            [],
            f"row_id long, property string, value string, reason string, severity string",
        )
    errs = df.select(
        F.col(row_id_col).cast("long").alias("row_id"),
        F.filter(F.array(*checks), lambda x: x.isNotNull()).alias("_errs"),
    )
    return errs.filter(F.size("_errs") > 0).select(
        "row_id", F.explode("_errs").alias("e")
    ).select("row_id", "e.property", "e.value", "e.reason", "e.severity")


def cap_violations(
    errors: DataFrame,
    max_violations: int,
    per: tuple = ("property", "reason"),
    row_id_col: str = "row_id",
) -> DataFrame:
    """V8 (data_loader.py:722-724): stop reporting after ``max_violations``.

    The reference counts violations per check while looping rows and stops
    appending past the cap; the set-oriented analogue keeps the FIRST
    ``max_violations`` error rows (ordered by row id) per (property, reason)
    — deterministic under any partitioning, and at scale it bounds the error
    relation instead of materializing millions of rows for a poisoned
    column.  The windowed rank runs per small key group; Catalyst pushes the
    rank filter into the window operator (no full sort of the table).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(c) for c in per]).orderBy(
        F.col(row_id_col).asc()
    )
    return (
        errors.withColumn("_vn", F.row_number().over(w))
        .filter(F.col("_vn") <= max_violations)
        .drop("_vn")
    )


def validate_header(columns: list[str], node_type: str, model: Model) -> dict:
    """V1 (data_loader.py:578-627): driver-side header-vs-model diff.

    Unknown plain columns -> warnings (loaded anyway, SURVEY §1.4); unknown
    parent-pointer columns or parent id fields -> errors (abort); missing
    required props -> errors (reason property_missing).
    """
    warnings, errors = [], []
    props = model.props_of(node_type)
    for col in columns:
        if col == "type":
            continue
        if model.is_parent_pointer(col):
            parent, fld = col.split(".", 1)
            if parent not in model.nodes:
                errors.append((col, "parent_node_not_in_model"))
            elif fld not in model.props_of(parent):
                errors.append((col, "parent_field_not_in_model"))
        elif model.is_relationship_property(col):
            rel, rprop = col.split(model.rel_prop_delimiter, 1)
            if rel not in model.relationships:
                errors.append((col, "relationship_not_in_model"))
            elif rprop not in model.relationships[rel].props:
                errors.append((col, "relationship_prop_not_in_model"))
        elif col not in props:
            warnings.append((col, "property_not_in_model"))
    for req in model.required_props(node_type):
        if req not in columns:
            errors.append((req, REASON_PROPERTY_MISSING))
    return {"warnings": warnings, "errors": errors}


def duplicate_id_errors(
    df: DataFrame,
    id_cols: list[str],
    signature_col: Column,
    row_id_col: str = "seq",
) -> DataFrame:
    """V5 (data_loader.py:660-692): same id twice.

    Same props-signature -> benign (multi-parent row); differing signatures
    -> one error row per id with the sorted list of involved row ids.
    Output: (id columns..., n_rows, n_signatures, row_ids, reason, severity).
    """
    return (
        df.groupBy(*id_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(signature_col).alias("n_signatures"),
            F.sort_array(F.collect_list(F.col(row_id_col))).alias("row_ids"),
        )
        .filter(F.col("n_signatures") > 1)
        .withColumn("reason", F.lit("duplicate_id_conflicting_properties"))
        .withColumn("severity", F.lit("error"))
    )


def parent_exists_errors(
    child_df: DataFrame,
    parent_df: DataFrame,
    child_fk: str,
    parent_key: str,
    row_id_col: str = "seq",
) -> DataFrame:
    """V6 (data_loader.py:529-557): children whose parent id doesn't resolve.

    left_anti join — at scale this is a broadcast anti-join when the parent
    key set is dimension-sized, else shuffle anti-join; Catalyst/AQE choose.
    Output: (row_id, property, value, reason, severity).
    """
    parents = parent_df.select(F.col(parent_key).alias("__pk")).distinct()
    return (
        child_df.filter(F.col(child_fk).isNotNull())
        .join(parents, child_df[child_fk] == F.col("__pk"), "left_anti")
        .select(
            F.col(row_id_col).cast("long").alias("row_id"),
            F.lit(child_fk).alias("property"),
            F.col(child_fk).cast("string").alias("value"),
            F.lit("missing_parent").alias("reason"),
            F.lit("error").alias("severity"),
        )
    )


def group_validation_report(errors: DataFrame) -> DataFrame:
    """A2 (data_loader.py:735-765): group violations for the report.

    Output: (property, value, reason, severity, n, row_ids) with row ids
    sorted and unique.
    """
    return (
        errors.groupBy("property", "value", "reason", "severity")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sort_array(F.collect_set("row_id")).alias("row_ids"),
        )
        .orderBy("property", "value")
    )
