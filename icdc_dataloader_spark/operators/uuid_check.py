"""UUID verify/repair over manifests (reference uuid_util.py:25-71).

The reference streams a TSV manifest row-by-row, recomputes
``get_uuid(domain, 'file', signature)`` per row, logs mismatches and
writes a corrected copy.  Set-oriented form: ONE projection computing the
expected uuid with the native sha1 Catalyst expression
(functions/identity.uuid5_expr — no Python in the loop), a mismatch flag,
and a repaired column; the counters come from a single aggregate.

IndexD mode keeps the ``<guid_prefix>/<uuid>`` shape: the prefix is
preserved and only the uuid part is verified/replaced
(uuid_util.py:42-51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.identity import uuid5_expr


def verify_uuids(
    df: DataFrame,
    domain: str,
    node_type: str = "file",
    uuid_col: str = "uuid",
    signature_col: str = "file_location",
    indexd_mode: bool = False,
) -> DataFrame:
    """Adds ``_expected_uuid`` / ``_uuid_ok`` / ``_repaired_uuid``.

    ``_repaired_uuid`` equals the current value when it already matches —
    writing it back yields the reference's corrected manifest.
    """
    expected = uuid5_expr(domain, node_type, F.col(signature_col))
    if indexd_mode:
        # '<guid_prefix>/<uuid>' (uuid_util.py:42-44); a value WITHOUT a
        # prefix is treated as a bare uuid — repairing must not invent a
        # prefix out of the old value
        parts = F.split(F.col(uuid_col), "/", 2)
        has_prefix = F.size(parts) == 2
        cur = F.when(has_prefix, F.element_at(parts, 2)).otherwise(
            F.col(uuid_col)
        )
        repaired = F.when(
            has_prefix, F.concat_ws("/", F.element_at(parts, 1), expected)
        ).otherwise(expected)
    else:
        cur = F.col(uuid_col)
        repaired = expected
    ok = cur == expected
    return (
        df.withColumn("_expected_uuid", expected)
        .withColumn("_uuid_ok", ok)
        .withColumn(
            "_repaired_uuid", F.when(ok, F.col(uuid_col)).otherwise(repaired)
        )
    )


def repair_uuids(df: DataFrame, uuid_col: str = "uuid", **kwargs) -> tuple:
    """Corrected manifest + (total, matched, repaired) counters — the
    reference's summary log lines (uuid_util.py:58-60) as one aggregate."""
    checked = verify_uuids(df, uuid_col=uuid_col, **kwargs)
    m = checked.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("_uuid_ok"), 1).otherwise(0)).alias("matched"),
    ).collect()[0]
    fixed = checked.withColumn(uuid_col, F.col("_repaired_uuid")).drop(
        "_expected_uuid", "_uuid_ok", "_repaired_uuid"
    )
    total, matched = int(m["total"]), int(m["matched"] or 0)
    return fixed, (total, matched, total - matched)
