"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators, Spark-first:

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus; dot product / norms as native ``zip_with``
  + ``aggregate`` expressions (JVM, no Python); per-query top-k via
  window row_number.  At 100 TB the corpus side stays distributed and the
  query side is broadcast — linear scan, no shuffle of the corpus.
- :func:`lsh_topk` — scale path: random-hyperplane LSH bucketing
  (deterministic seeded planes, xxhash-free — planes derived from a seed),
  candidates = bucket collisions across ``n_tables`` tables, exact rerank
  of candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, sim).

    ``queries`` is broadcast (small side); rank ties broken by neighbor id
    so results are fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (
        _norm(F.col("_qv")) * _norm(F.col("_cv"))
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id", sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _hyperplane_sign_bits(vec_col, dim: int, n_planes: int, seed: int):
    """LSH bucket id: sign bits of dot(v, plane_j) for deterministic
    pseudo-random planes plane_j[i] = hash(seed, j, i) mapped to [-1, 1)."""
    bits = []
    for j in range(n_planes):
        plane = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(j), i), F.lit(2_000_000))
                / F.lit(1_000_000.0)
            )
            - F.lit(1.0),
        )
        d = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**j))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact rerank.

    Corpus is scanned once per table (union), shuffled by (table, bucket) —
    candidate sets are tiny vs the corpus, so the expensive rerank is
    bounded.  Recall improves with n_tables.
    """
    def with_buckets(df, role_id):
        parts = []
        for t in range(n_tables):
            parts.append(
                df.select(
                    F.col(id_col).alias(role_id),
                    F.col(vec_col).alias(f"_{role_id}_v"),
                    F.lit(t).alias("table_id"),
                    _hyperplane_sign_bits(
                        F.col(vec_col), dim, n_planes, seed + 1000 * t
                    ).alias("bucket"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    cb = with_buckets(corpus, "neighbor_id")
    qb = with_buckets(queries, "query_id")
    cand = cb.join(qb, ["table_id", "bucket"]).select(
        "query_id", "neighbor_id", "_query_id_v", "_neighbor_id_v"
    ).dropDuplicates(["query_id", "neighbor_id"])
    sim = F.round(
        _dot(F.col("_query_id_v"), F.col("_neighbor_id_v"))
        / (_norm(F.col("_query_id_v")) * _norm(F.col("_neighbor_id_v"))),
        6,
    )
    scored = cand.select("query_id", "neighbor_id", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_cosine_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold (LSH-bucketed).

    Output: (id_a, id_b, sim) with id_a < id_b.
    """
    def with_buckets(role):
        parts = []
        for t in range(n_tables):
            parts.append(
                df.select(
                    F.col(id_col).alias(role),
                    F.col(vec_col).alias(f"_{role}_v"),
                    F.lit(t).alias("table_id"),
                    _hyperplane_sign_bits(
                        F.col(vec_col), dim, n_planes, seed + 1000 * t
                    ).alias("bucket"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    a = with_buckets("id_a")
    b = with_buckets("id_b")
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = _dot(F.col("_id_a_v"), F.col("_id_b_v")) / (
        _norm(F.col("_id_a_v")) * _norm(F.col("_id_b_v"))
    )
    return (
        cand.select("id_a", "id_b", F.round(sim, 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
