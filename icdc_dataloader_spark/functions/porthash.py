"""Portable (cross-engine) hash primitives.

The scale-path operators hash with ``xxhash64`` — JVM whole-stage-codegen,
the fastest primitive Spark has.  xxhash64 does not exist in other engines,
so every hash-based operator (minhash, simhash, fingerprint, LSH) also has
a *portable* mode whose primitive is md5 — bit-identical in Spark, DuckDB
and Python — with the first ``n_hex`` hex chars reinterpreted as a
non-negative int64 (15 hex chars = 60 bits < 2^63, so the value is identical
under signed and unsigned interpretation).

The operators are otherwise IDENTICAL in both modes; only the hash
primitive is swapped.  Portable mode is what the driver's DuckDB oracle
verifies value-for-value; xxhash64 mode is what the benchmark runs.  The
reference has no analogue (it hashes with Python hashlib row-at-a-time,
e.g. file md5/sha512 at file_loader.py:98-113).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

N_HEX = 15  # 60 bits


def hex_int(col: Column, n_hex: int = N_HEX) -> Column:
    """Spark side: first ``n_hex`` md5 hex chars as a non-negative long."""
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


def hex_int_sql(expr: str, n_hex: int = N_HEX) -> str:
    """DuckDB side of :func:`hex_int` — same bits, same value."""
    return f"CAST('0x' || substr(md5({expr}), 1, {n_hex}) AS BIGINT)"


def remix(col: Column, i: int, n_hex: int = N_HEX) -> Column:
    """Independent hash family member i: md5 of '<h>:<i>' (h as decimal
    string — BIGINT-to-string formatting is identical across engines)."""
    return hex_int(F.concat(col.cast("string"), F.lit(f":{i}")), n_hex)


def remix_sql(expr: str, i: int, n_hex: int = N_HEX) -> str:
    return hex_int_sql(f"CAST({expr} AS VARCHAR) || ':{i}'", n_hex)
