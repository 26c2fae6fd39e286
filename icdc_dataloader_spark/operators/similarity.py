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

    Norms are computed ONCE PER SIDE before the join, not per pair: each
    side carries a precomputed ``_?n`` column, so the O(|corpus|x|queries|)
    inner loop evaluates only the dot product.  Same double arithmetic and
    operand order as the inline form, so the rounded sim is bit-identical
    (the DuckDB oracle still matches value-for-value); at 10^9 x 10^3 pairs
    this removes two 64-element aggregate expressions from every pair.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    sim = F.try_divide(
        _dot(F.col("_qv"), F.col("_cv")),
        F.col("_qn") * F.col("_cn"),
    )  # zero-norm vectors -> NULL sim (ranked last), not an ANSI error
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


def wta_pairs(dim: int, n_bits: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic coordinate pairs for rank-correlation LSH.

    Bit j of the bucket id is ``vec[p_j] >= vec[q_j]`` — an axis-pair
    comparison, i.e. a random hyperplane with exactly two nonzero (+1/-1)
    entries.  This is the 2-ary case of Winner-Take-All hashing (Yagnik et
    al., ICCV 2011, public): locality-sensitive for rank/cosine similarity
    on roughly isotropic embeddings, and — unlike real-valued hyperplane
    dots — decided by a single float comparison, so the bucket id is
    bit-reproducible across engines (the DuckDB oracle replicates it
    exactly; no summation-order / rounding hazard at the sign boundary).
    """
    import random

    rng = random.Random(seed)
    pairs = []
    for _ in range(n_bits):
        p = rng.randrange(dim)
        q = rng.randrange(dim - 1)
        if q >= p:
            q += 1  # q != p
        pairs.append((p, q))
    return pairs


def wta_bucket_expr(vec_col, pairs: list[tuple[int, int]]):
    """bucket id = sum_j 2^j * [vec[p_j] >= vec[q_j]]  (element_at 1-based)."""
    out = None
    for j, (p, q) in enumerate(pairs):
        bit = F.when(
            F.element_at(vec_col, p + 1) >= F.element_at(vec_col, q + 1),
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out


def _tabled_buckets(
    df: DataFrame,
    role_id: str,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
) -> DataFrame:
    """(id, vec, table_id, bucket) — one row per (input row, hash table).

    Emitted as ONE scan + posexplode of the per-table bucket array rather
    than an n_tables-way union of projections: the union scanned the
    corpus once per table (n_tables Scan branches, each its own codegen
    unit), while posexplode computes every table's bucket in a single
    codegen'd projection pass.  Row set is identical (table_id = array
    position)."""
    buckets = F.array(
        *[
            wta_bucket_expr(
                F.col(vec_col), wta_pairs(dim, n_planes, seed + 1000 * t)
            )
            for t in range(n_tables)
        ]
    )
    return df.select(
        F.col(id_col).alias(role_id),
        F.col(vec_col).alias(f"_{role_id}_v"),
        F.posexplode(buckets).alias("table_id", "bucket"),
    )


def _cap_buckets(banded: DataFrame, max_bucket_size: int) -> DataFrame:
    """Drop non-discriminative buckets BEFORE the candidate join.

    A degenerate bucket (e.g. all-zero vectors collapsing every comparison
    to 'equal') would otherwise contribute O(size^2) candidate pairs —
    same cap as minhash_lsh_dedup (dedup.py) applies.

    ``banded`` is deliberately NOT persisted even though the plan
    references it twice (sizes agg + capped join) — the opposite call from
    minhash_lsh_dedup's signature persist.  The asymmetry is
    cost-shape: a minhash signature is an expensive REDUCTION (shingle
    explode + 32-way min agg) that caches tiny, while ``banded`` is a
    cheap shuffle-free EXPANSION (a few float comparisons per row,
    n_tables rows out per row in, each carrying the full vector).
    Recomputing it costs one extra columnar scan + projection;
    persisting it would materialize n_tables x corpus x vector bytes.
    At 10^9 vectors recompute wins by orders of magnitude.
    """
    sizes = banded.groupBy("table_id", "bucket").agg(F.count(F.lit(1)).alias("_n"))
    return banded.join(
        F.broadcast(sizes.filter(F.col("_n") <= max_bucket_size)).select(
            "table_id", "bucket"
        ),
        ["table_id", "bucket"],
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = 4,
    n_tables: int = 16,
    seed: int = 42,
    max_bucket_size: int = 1000,
    corpus_count: int | None = None,
) -> DataFrame:
    """Approximate top-k: WTA-bucket-join candidates, exact rerank.

    Corpus is scanned once per table (union), shuffled by (table, bucket) —
    candidate sets are tiny vs the corpus, so the expensive rerank is
    bounded.  Oversized (non-discriminative) buckets are dropped on the
    corpus side before the join (see :func:`_cap_buckets`).  The whole
    pipeline — buckets, candidates, exact rerank — is replicated by the
    DuckDB oracle (hash_queries.lsh_ann_sql).

    Recall/cost tradeoff, measured at sf0.1 (2000×64-dim vectors, 50
    queries, recall@10 vs exact cosine ground truth):

    ====== ======= ========  fewer planes -> coarser buckets -> more
    planes tables  recall    candidates per table (cost ↑, recall ↑);
    ====== ======= ========  more tables -> more collision chances
       6       4    0.27     (cost ∝ tables, recall ↑).  Defaults pin
       4       8    0.74     the 0.93 point; raise n_tables to 32 for
       4      16    0.93     0.99 at ~2x candidate volume.  Asserted
       4      32    0.99     ≥0.8 in tests/test_lsh_recall.py.
    ====== ======= ========

    **Plane count must grow with the corpus** (self-review finding): with
    p planes a table has only 2^p buckets, so past ~2^p × max_bucket_size
    corpus rows EVERY bucket trips the discriminativeness cap and the
    candidate set collapses to zero.  Pass ``n_planes=None`` to size it
    from the corpus: p = max(4, ceil(log2(n / (max_bucket_size/4))) + 2),
    i.e. ~max_bucket_size/16 expected rows per bucket — the extra two
    planes are margin for skewed (non-uniform) bucket occupancy, so the
    typical bucket stays well under the cap even when popular buckets run
    ~10x the mean.  At 100 TB scale that is ~30 planes, keeping
    per-bucket candidate work constant while recall is bought back with
    ``n_tables``.
    """
    if n_planes is None:
        import math

        n = corpus_count if corpus_count is not None else corpus.count()
        target = max(1, max_bucket_size // 4)
        n_planes = max(4, math.ceil(math.log2(max(2, n) / target)) + 2)
    cb = _cap_buckets(
        _tabled_buckets(
            corpus, "neighbor_id", id_col, vec_col, dim, n_planes, n_tables, seed
        ),
        max_bucket_size,
    )
    qb = _tabled_buckets(
        queries, "query_id", id_col, vec_col, dim, n_planes, n_tables, seed
    )
    # the query side is small by contract (a probe set, not a corpus):
    # broadcast it so the banded corpus is never shuffled for this join —
    # without the hint the planner's size estimate for the exploded union
    # picked a sort-merge join, paying a full shuffle+sort of the corpus
    # buckets (plans/r06/lsh_ann_topk_bench_before.txt)
    cand = cb.join(F.broadcast(qb), ["table_id", "bucket"]).select(
        "query_id", "neighbor_id", "_query_id_v", "_neighbor_id_v"
    ).dropDuplicates(["query_id", "neighbor_id"])
    # try_divide: a zero-norm vector (all-zero embedding — real corpora
    # contain them) must yield NULL sim (ranked last), not an ANSI
    # divide-by-zero task failure
    sim = F.round(
        F.try_divide(
            _dot(F.col("_query_id_v"), F.col("_neighbor_id_v")),
            _norm(F.col("_query_id_v")) * _norm(F.col("_neighbor_id_v")),
        ),
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
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold (LSH-bucketed).

    WTA buckets (see :func:`wta_pairs`) with the same oversized-bucket cap
    as minhash_lsh_dedup, then exact cosine on the candidate pairs only.
    Identical vectors land in the same bucket in EVERY table (all
    comparisons equal), so true duplicates are found with probability 1.
    Output: (id_a, id_b, sim) with id_a < id_b.
    """
    banded = _cap_buckets(
        _tabled_buckets(df, "id", id_col, vec_col, dim, n_planes, n_tables, seed),
        max_bucket_size,
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("_id_v").alias("_id_a_v"),
        "table_id", "bucket",
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("_id_v").alias("_id_b_v"),
        "table_id", "bucket",
    )
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = F.try_divide(
        _dot(F.col("_id_a_v"), F.col("_id_b_v")),
        _norm(F.col("_id_a_v")) * _norm(F.col("_id_b_v"))
    )
    return (
        cand.select("id_a", "id_b", F.round(sim, 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
