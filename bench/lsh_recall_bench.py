"""LSH ANN recall at a realistic corpus size (round-3 VERDICT #4).

Round 3 evidenced recall 0.93@10 on the 2,000-vector sf0.1 table; this
bench re-measures on a generated 100,000+ vector clustered corpus
(sources/gen.gen_embeddings_spark — same distributed recipe at any
scale) with 128 queries, against exact brute-force cosine ground truth,
and also reports per-query candidate-set sizes — the quantity that
proves the approximation is CHEAP as well as good (full scan = N
candidates/query; LSH should be orders of magnitude below).

Run: python bench/lsh_recall_bench.py [n_vectors] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

K = 10
N_QUERIES = 128
DIM = 64


def run(n_vectors: int = 100_000, cpus: int = 32) -> dict:
    from icdc_dataloader_spark.operators import similarity
    from icdc_dataloader_spark.session import get_spark
    from icdc_dataloader_spark.sources.gen import gen_embeddings_spark

    spark = get_spark("lsh_recall", parallelism=cpus, shuffle_partitions=cpus)
    path = f"/tmp/lsh_recall_{n_vectors}"
    if not os.path.isdir(path):
        gen_embeddings_spark(
            spark, n_vectors, dim=DIM, n_clusters=max(50, n_vectors // 100)
        ).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path).cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES).cache()

    t0 = time.time()
    truth = {
        (r[0], r[1])
        for r in similarity.cosine_topk(emb, queries, k=K)
        .select("query_id", "neighbor_id").collect()
    }
    exact_sec = time.time() - t0

    n_planes, n_tables = None, 16  # engine defaults (auto planes)
    t0 = time.time()
    approx = {
        (r[0], r[1])
        for r in similarity.lsh_topk(
            emb, queries, dim=DIM, k=K,
            n_planes=n_planes, n_tables=n_tables,
        ).select("query_id", "neighbor_id").collect()
    }
    lsh_sec = time.time() - t0
    recall = len(approx & truth) / len(truth)

    # candidate-set size per query: replicate the candidate stage
    # (buckets -> cap -> join -> distinct pair) and count per query
    import math

    auto_planes = max(4, math.ceil(math.log2(max(2, n_vectors) / 250)) + 2)
    cb = similarity._cap_buckets(
        similarity._tabled_buckets(
            emb, "neighbor_id", "vec_id", "embedding", DIM,
            auto_planes, n_tables, 42,
        ),
        1000,
    )
    qb = similarity._tabled_buckets(
        queries, "query_id", "vec_id", "embedding", DIM,
        auto_planes, n_tables, 42,
    )
    counts = (
        cb.join(qb, ["table_id", "bucket"])
        .select("query_id", "neighbor_id").distinct()
        .groupBy("query_id").count()
    )
    stats = counts.agg(
        F.count("*").alias("queries_with_candidates"),
        F.mean("count").alias("mean"),
        F.expr("percentile(count, 0.5)").alias("p50"),
        F.expr("percentile(count, 0.95)").alias("p95"),
        F.max("count").alias("mx"),
    ).first()

    out = {
        "n_vectors": n_vectors,
        "dim": DIM,
        "n_queries": N_QUERIES,
        "k": K,
        "n_planes_auto": auto_planes,
        "n_tables": n_tables,
        "recall_at_10": round(recall, 4),
        "exact_scan_sec": round(exact_sec, 3),
        "lsh_sec": round(lsh_sec, 3),
        "candidates_per_query": {
            "mean": round(float(stats["mean"]), 1),
            "p50": float(stats["p50"]),
            "p95": float(stats["p95"]),
            "max": int(stats["mx"]),
            "queries_with_candidates": int(stats["queries_with_candidates"]),
        },
        "scan_fraction": round(float(stats["mean"]) / n_vectors, 5),
    }
    spark.stop()
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(json.dumps(run(n, cpus)))
