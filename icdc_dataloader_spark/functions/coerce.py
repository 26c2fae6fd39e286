"""Type coercion with reference parity (reference: data_loader.py:383-436).

The reference coerces every TSV string cell according to the model-declared
type, with deliberately quirky semantics our engine reproduces bit-for-bit:

- Boolean (data_loader.py:399-408): ``re.search(r'yes|true', v, IGNORECASE)``
  anywhere in the string -> True; else ``re.search(r'no|false')`` -> False;
  else None.  So ``'YeS13'`` -> True and ``' Normal '`` -> False (substring
  ``no``) — pinned by reference tests/test_loader.py:79-95.
- Int / Float (data_loader.py:409-426): Python ``int(v)`` / ``float(v)``;
  ValueError -> None.  ``' 12 Normal '`` -> None, ``' 1.5 '`` -> 1.5.
- Array (data_loader.py:427-430 + icdc_schema.py:154-155): split on the props
  delimiter (default ``|``), strip items, drop empties, stored by the
  reference as a JSON string via ``json.dumps``.
- Date/DateTime (data_loader.py:431-436): bento ``reformat_date`` -> '%Y-%m-%d'.

Two implementations per type:

- ``*_expr``   — native Catalyst expressions (JVM, whole-stage codegen): the
  hot path at 100 TB.  No Python in the task.
- ``parity_*`` — pandas (Arrow-batched) UDFs that call the exact Python
  semantics.  Used in tests to prove the native expressions agree, and
  available when a deployment demands bit-level parity over raw speed.

Property tests (tests/test_coerce.py) assert native == parity over a
hypothesis-generated corpus including the reference's pinned corner cases.
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Native (Catalyst) expressions — the hot path
# ---------------------------------------------------------------------------

# Python's int()/float() accept underscores between digits and surrounding
# whitespace; these regexes mirror that grammar exactly.
_INT_RE = r"^[+-]?[0-9]+(_[0-9]+)*$"
_NUM_RE = (
    r"^[+-]?(([0-9]+(_[0-9]+)*(\.([0-9]+(_[0-9]+)*)?)?)"
    r"|(\.[0-9]+(_[0-9]+)*))([eE][+-]?[0-9]+(_[0-9]+)*)?$"
)
_INF_RE = r"(?i)^[+-]?inf(inity)?$"
_NAN_RE = r"(?i)^[+-]?nan$"
_WS_TRIM = r"^\s+|\s+$"


def _pytrim(col: Column) -> Column:
    """Trim like Python str.strip() (all whitespace, not just spaces)."""
    return F.regexp_replace(col, _WS_TRIM, "")


def boolean_expr(col: Column) -> Column:
    """Reference Boolean coercion (data_loader.py:399-408): substring search.

    'yes'/'true' anywhere (case-insensitive) wins over 'no'/'false';
    anything else -> NULL.  'Normal' -> False because 'no' is a substring.
    """
    return (
        F.when(col.isNull(), F.lit(None).cast("boolean"))
        .when(col.rlike("(?i)yes|true"), F.lit(True))
        .when(col.rlike("(?i)no|false"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def int_expr(col: Column) -> Column:
    """Reference Int coercion (data_loader.py:409-417): Python int(v) else NULL."""
    t = _pytrim(col)
    return F.when(
        t.rlike(_INT_RE), F.regexp_replace(t, "_", "").cast(T.LongType())
    ).otherwise(F.lit(None).cast(T.LongType()))


def float_expr(col: Column) -> Column:
    """Reference Float coercion (data_loader.py:418-426): Python float(v) else NULL."""
    t = _pytrim(col)
    cleaned = F.regexp_replace(t, "_", "")
    return (
        F.when(t.rlike(_NUM_RE), cleaned.cast(T.DoubleType()))
        .when(
            t.rlike(_INF_RE),
            F.when(t.startswith("-"), F.lit(float("-inf"))).otherwise(
                F.lit(float("inf"))
            ),
        )
        .when(t.rlike(_NAN_RE), F.lit(float("nan")))
        .otherwise(F.lit(None).cast(T.DoubleType()))
    )


def array_expr(col: Column, delimiter: str = "|") -> Column:
    """Reference list split (icdc_schema.py:154-155): split, strip, drop empty.

    Returns ArrayType(String); use :func:`array_json_expr` at a sink boundary
    that needs the reference's JSON-string storage format.
    """
    parts = F.split(col, "[" + delimiter + "]" if delimiter == "|" else delimiter)
    trimmed = F.transform(parts, lambda x: F.regexp_replace(x, _WS_TRIM, ""))
    return F.filter(trimmed, lambda x: x != "")


def array_json_expr(col: Column, delimiter: str = "|") -> Column:
    """Array coerced then stored as JSON string (data_loader.py:427-430).

    Matches ``json.dumps(items)`` formatting: ``["a", "b"]`` (space after
    comma) — built with concat so the string is byte-identical to the
    reference without leaving the JVM.
    """
    arr = array_expr(col, delimiter)
    quoted = F.transform(
        arr,
        lambda x: F.concat(
            F.lit('"'),
            F.regexp_replace(F.regexp_replace(x, r"\\", r"\\\\"), '"', r'\\"'),
            F.lit('"'),
        ),
    )
    return F.when(
        col.isNotNull(),
        F.concat(F.lit("["), F.array_join(quoted, ", "), F.lit("]")),
    )


def date_expr(col: Column) -> Column:
    """Date/DateTime normalization to '%Y-%m-%d' (data_loader.py:431-436).

    The reference delegates to bento ``reformat_date`` (dateutil parse ->
    ISO date string).  We accept the formats that occur in the reference's
    datasets: ISO, m/d/Y, Y/m/d, 'Mon DD, YYYY'.
    """
    t = _pytrim(col)
    parsed = F.coalesce(
        F.try_to_timestamp(t, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(t, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(t, F.lit("M/d/yyyy")),
        F.try_to_timestamp(t, F.lit("yyyy/M/d")),
        F.try_to_timestamp(t, F.lit("MMM d, yyyy")),
    )
    return F.date_format(parsed, "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# Parity pandas UDFs — exact Python semantics, Arrow-batched
# ---------------------------------------------------------------------------


def _py_boolean(v):
    import re

    if not isinstance(v, str):
        return None
    if re.search(r"yes|true", v, re.IGNORECASE):
        return True
    if re.search(r"no|false", v, re.IGNORECASE):
        return False
    return None


def _py_int(v):
    try:
        return None if v is None else int(v)
    except ValueError:
        return None


def _py_float(v):
    try:
        return None if v is None else float(v)
    except ValueError:
        return None


@F.pandas_udf(T.BooleanType())
def parity_boolean(s: pd.Series) -> pd.Series:
    return s.map(_py_boolean).astype("object")


@F.pandas_udf(T.LongType())
def parity_int(s: pd.Series) -> pd.Series:
    return s.map(_py_int).astype("object")


@F.pandas_udf(T.DoubleType())
def parity_float(s: pd.Series) -> pd.Series:
    return s.map(_py_float).astype("float64")


def make_parity_array_json(delimiter: str = "|"):
    """Pandas UDF: reference Array coercion to a json.dumps string."""

    def _split(v):
        if v is None:
            return None
        items = [item.strip() for item in v.split(delimiter) if item.strip()]
        return json.dumps(items)

    @F.pandas_udf(T.StringType())
    def parity_array_json(s: pd.Series) -> pd.Series:
        return s.map(_split)

    return parity_array_json


# Pure-Python versions for the oracle (single source of truth for semantics).
def py_coerce(value, key_type: str, delimiter: str = "|"):
    """Reference prepare_node coercion for one value (oracle-side)."""
    if key_type == "Boolean":
        return _py_boolean(value)
    if key_type == "Int":
        return _py_int(value)
    if key_type == "Float":
        v = _py_float(value)
        if v is not None and math.isnan(v):
            return v
        return v
    if key_type == "Array":
        if value is None:
            return None
        return json.dumps([i.strip() for i in value.split(delimiter) if i.strip()])
    return value
