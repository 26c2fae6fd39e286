"""Round-3: the LSH top-k approximation must be GOOD, not just correctly
computed (the DuckDB oracle proves the latter; this proves the former).

Recall@k is measured against the exact brute-force cosine ranking on the
largest local corpus (sf0.1: 2000×64-dim vectors) with the pinned default
parameters, and the monotone recall-vs-n_tables relationship is spot-
checked so parameter regressions surface as test failures."""

import os

import pytest
from pyspark.sql import functions as F

from icdc_dataloader_spark.operators import similarity

SF_DIR = os.environ.get("TEST_LSH_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def emb(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _recall(emb, n_planes, n_tables, k=10, n_queries=50):
    queries = emb.filter(F.col("vec_id") < n_queries)
    truth = {
        (r[0], r[1])
        for r in similarity.cosine_topk(emb, queries, k=k)
        .select("query_id", "neighbor_id")
        .collect()
    }
    approx = {
        (r[0], r[1])
        for r in similarity.lsh_topk(
            emb, queries, dim=64, k=k, n_planes=n_planes, n_tables=n_tables
        )
        .select("query_id", "neighbor_id")
        .collect()
    }
    return len(approx & truth) / len(truth)


def test_default_params_hit_recall_floor(spark, emb):
    assert _recall(emb, n_planes=4, n_tables=16) >= 0.8


def test_recall_improves_with_tables(spark, emb):
    lo = _recall(emb, n_planes=4, n_tables=4)
    hi = _recall(emb, n_planes=4, n_tables=16)
    assert hi > lo  # documented tradeoff direction holds on real data


def test_auto_planes_prevents_bucket_collapse(spark):
    """Self-review fix: with p planes a table has 2^p buckets; past
    2^p x max_bucket_size corpus rows every bucket trips the cap and the
    candidate set collapses.  n_planes=None sizes p from the corpus."""
    n = 5000
    corpus = (
        spark.range(n)
        .selectExpr(
            "id as vec_id",
            "transform(sequence(1, 16), "
            " j -> cast(sin(id * j * 0.7) as float)) as embedding",
        )
    ).cache()
    queries = corpus.filter("vec_id < 10")
    # fixed 4 planes + tiny cap: every bucket oversized -> zero candidates
    collapsed = similarity.lsh_topk(
        corpus, queries, dim=16, k=5, n_planes=4, n_tables=2,
        max_bucket_size=50,
    ).count()
    assert collapsed == 0
    # auto-sizing keeps buckets under the cap and candidates flowing
    auto = similarity.lsh_topk(
        corpus, queries, dim=16, k=5, n_planes=None, n_tables=8,
        max_bucket_size=50, corpus_count=n,
    )
    assert auto.count() >= 10  # every query got neighbors back


def test_recall_floor_at_100k_corpus(spark):
    """Round-4: the recall floor re-evidenced at a realistic corpus
    (VERDICT #4) — 100k clustered vectors (gen_embeddings_spark), auto
    plane count, recall@10 vs exact ground truth on 50 queries.
    Measured 0.98 (bench/lsh_recall_bench.py); floored at 0.85."""
    from icdc_dataloader_spark.sources.gen import gen_embeddings_spark

    emb = gen_embeddings_spark(spark, 100_000, dim=64, n_clusters=1000).cache()
    try:
        queries = emb.filter(F.col("vec_id") < 50)
        truth = {
            (r[0], r[1])
            for r in similarity.cosine_topk(emb, queries, k=10)
            .select("query_id", "neighbor_id").collect()
        }
        approx = {
            (r[0], r[1])
            for r in similarity.lsh_topk(
                emb, queries, dim=64, k=10, n_planes=None, n_tables=16
            ).select("query_id", "neighbor_id").collect()
        }
        assert len(approx & truth) / len(truth) >= 0.85
    finally:
        emb.unpersist()
