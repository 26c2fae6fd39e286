"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: LWW dedup over the events stream (the
                north-star CDC operator, A7 in SURVEY.md §2.6) at sf0.001;
                one-shuffle partial-agg plan (round-6 optimization — the
                explicit salted two-phase plan remains in operators/dedup).
queries()     — one entry per implemented operator family from SURVEY.md §2
                (see icdc_dataloader_spark/queries.py for the mapping).
oracle_sql()  — matching DuckDB SQL for EVERY query registered in
                queries() (len(oracle_sql()) == len(queries())):
                hash-based/approximate operators run portable-hash modes
                whose full pipelines are replicated term-for-term in SQL
                (hash_queries.py); uuid5 and the schema-derived model docs
                compare against pinned VALUES oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icdc_dataloader_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["lww_latest_event"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
