"""LWW strategy auto-dispatch under a skew threshold (round-3 VERDICT #5).

The measured facts it pins (bench/skew_bench.py; BENCH/BASELINE.md r4):
a hot key above the share threshold dispatches to 'agg' (structural
map-side collapse), a well-spread key set dispatches to 'window' only
while Catalyst's InferWindowGroupLimit rule is active, and never to
'salted' or to the naive one-task-per-key window plan.
"""

import pytest
from pyspark.sql import functions as F

from icdc_dataloader_spark.operators.dedup import (
    choose_lww_strategy,
    lww_dedup,
)

THRESH_CONF = "spark.sql.optimizer.windowGroupLimitThreshold"


def _skewed(spark, n=50_000):
    # ~50% of rows on one key, remainder spread over 5k keys
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 5000).cast("string")))
        .alias("repo"),
        F.lit("p").alias("path"),
        F.col("id").alias("seq"),
        F.col("id").cast("string").alias("content"),
    )


def _uniform(spark, n=50_000):
    return spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % 5000).cast("string")).alias("repo"),
        F.lit("p").alias("path"),
        F.col("id").alias("seq"),
        F.col("id").cast("string").alias("content"),
    )


@pytest.fixture
def rule_on(spark):
    old = spark.conf.get(THRESH_CONF, "1000")
    spark.conf.set(THRESH_CONF, "1000")
    yield
    spark.conf.set(THRESH_CONF, old)


def test_hot_key_dispatches_to_agg(spark, rule_on):
    assert choose_lww_strategy(
        _skewed(spark), ["repo", "path"], sample_frac=0.2
    ) == "agg"


def test_uniform_dispatches_to_window_with_rule_active(spark, rule_on):
    assert choose_lww_strategy(
        _uniform(spark), ["repo", "path"], sample_frac=0.2
    ) == "window"


def test_uniform_falls_back_to_agg_with_rule_disabled(spark):
    old = spark.conf.get(THRESH_CONF, "1000")
    spark.conf.set(THRESH_CONF, "-1")
    try:
        # without InferWindowGroupLimit the rn=1 window is the one-task
        # hot-key funnel — auto must not emit it even for uniform keys
        assert choose_lww_strategy(
            _uniform(spark), ["repo", "path"], sample_frac=0.2
        ) == "agg"
    finally:
        spark.conf.set(THRESH_CONF, old)


def test_auto_strategy_results_match_explicit(spark, rule_on):
    df = _skewed(spark, n=20_000)
    expect = sorted(
        (r["repo"], r["path"], r["seq"])
        for r in lww_dedup(
            df, ["repo", "path"], seq_col="seq", strategy="agg"
        ).collect()
    )
    got = sorted(
        (r["repo"], r["path"], r["seq"])
        for r in lww_dedup(
            df, ["repo", "path"], seq_col="seq", strategy="auto"
        ).collect()
    )
    assert got == expect


def test_window_plan_has_partial_group_limit(spark, rule_on):
    """The plan 'auto' relies on: rn=1 window carries a Partial
    WindowGroupLimit BELOW the exchange (map-side top-1) — if a Spark
    upgrade drops this rewrite, dispatch must be revisited."""
    plan = (
        lww_dedup(
            _uniform(spark), ["repo", "path"], seq_col="seq",
            strategy="window",
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan
