"""Deterministic synthetic CDC event generators (no external data).

Two implementations of the SAME logical stream:

- :func:`gen_events_pandas` — pure Python/numpy, small scale; the SAME
  parquet file feeds both the Spark engine and the pure-Python oracle, so
  parity tests never depend on two generators agreeing.
- :func:`gen_events_spark` — distributed ``spark.range`` derivation for
  bench volumes (10^6-10^8 locally, 10^10 by design): every column is a
  pure function of the row id (xxhash64 / sha2 / arithmetic), so generation
  is embarrassingly parallel, seed-stable, and never bottlenecks on the
  driver.

Event shape (FIXTURES.md F2): seq, op(upsert|new|delete), ts, repo, path,
commit, lang, content, batch_id.  Key = (repo, path); hot-repo skew is
Zipf-like via a power transform of a uniform hash.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "scala", "go", "rust", "c", "md", "yaml", "other"]


def _commit_hex(seed: int, seq: int) -> str:
    return hashlib.sha1(f"{seed}:{seq}".encode()).hexdigest()


def _content(seed: int, repo: str, path: str, seq: int) -> str:
    h = hashlib.sha256(f"{seed}:{repo}:{path}:{seq}".encode()).hexdigest()
    return f"// {repo}/{path} @ {seq}\n" + (h + "\n") * 4


def gen_events_pandas(
    n_events: int = 10_000,
    n_repos: int = 50,
    n_paths: int = 20,
    seed: int = 42,
    n_batches: int = 8,
    p_delete: float = 0.05,
    p_new: float = 0.05,
    p_invalid_lang: float = 0.0,
    p_empty_required: float = 0.0,
    zipf_a: float | None = None,
    shuffle_arrival: bool = True,
) -> pd.DataFrame:
    """Small-scale deterministic events as a pandas DataFrame."""
    rng = np.random.RandomState(seed)
    seqs = np.arange(n_events, dtype=np.int64)
    if zipf_a:
        u = rng.random_sample(n_events)
        repo_idx = np.minimum((n_repos * (u**zipf_a)).astype(int), n_repos - 1)
    else:
        repo_idx = rng.randint(0, n_repos, n_events)
    path_idx = rng.randint(0, n_paths, n_events)
    ops = rng.choice(
        ["upsert", "new", "delete"],
        n_events,
        p=[1 - p_delete - p_new, p_new, p_delete],
    )
    langs = [LANGS[i] for i in rng.randint(0, len(LANGS), n_events)]
    if p_invalid_lang:
        bad = rng.random_sample(n_events) < p_invalid_lang
        langs = [("klingon" if b else l) for b, l in zip(bad, langs)]

    repos = [f"org{i % 10}/repo{i}" for i in repo_idx]
    paths = [f"src/mod{j}/file{j}.py" for j in path_idx]
    if p_empty_required:
        empty = rng.random_sample(n_events) < p_empty_required
        repos = [("" if b else r) for b, r in zip(empty, repos)]

    df = pd.DataFrame(
        {
            "seq": seqs,
            "op": ops,
            "repo": repos,
            "path": paths,
            "commit": [_commit_hex(seed, s) for s in seqs],
            "lang": langs,
            "content": [
                None if op == "delete" else _content(seed, r, p, s)
                for op, r, p, s in zip(ops, repos, paths, seqs)
            ],
        }
    )
    # microsecond precision: Spark can't read parquet TIMESTAMP(NANOS)
    df["ts"] = (pd.Timestamp("2024-01-01") + pd.to_timedelta(df["seq"], unit="s")).astype(
        "datetime64[us]"
    )
    order = rng.permutation(n_events) if shuffle_arrival else np.arange(n_events)
    df = df.iloc[order].reset_index(drop=True)
    # batches partition ARRIVAL order => seq is out of order within/between
    # batches; tombstones + seq-LWW keep the final state order-independent.
    df["batch_id"] = (np.arange(n_events) * n_batches // n_events).astype(np.int64)
    return df


def gen_events_spark(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 10_000,
    n_paths: int = 100,
    seed: int = 42,
    n_batches: int = 4,
    p_delete: float = 0.02,
    zipf_k: float = 3.0,
    content_repeat: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generator: every column derived from the row id.

    ``zipf_k`` > 1 concentrates repos (hot-key skew): repo index =
    floor(n_repos * u^k) for u = uniform hash in [0,1).
    """
    df = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)
    repo_i = F.floor(F.lit(n_repos) * F.pow(u, F.lit(zipf_k))).cast("long")
    path_i = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(n_paths))
    op_u = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(1000)) / 1000.0
    lang_i = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(len(LANGS)))
    langs = F.array(*[F.lit(l) for l in LANGS])
    body = F.sha2(F.concat_ws(":", F.lit(seed), F.col("id")), 256)
    return df.select(
        F.col("id").alias("seq"),
        F.when(op_u < p_delete, "delete").otherwise("upsert").alias("op"),
        (F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(secs=F.col("id"))).alias("ts"),
        F.concat(F.lit("org"), (repo_i % 10).cast("string"), F.lit("/repo"), repo_i.cast("string")).alias("repo"),
        F.concat(F.lit("src/mod"), path_i.cast("string"), F.lit("/file"), path_i.cast("string"), F.lit(".py")).alias("path"),
        F.substring(F.sha2(F.concat_ws(":", F.lit(seed), F.col("id"), F.lit("c")), 256), 1, 40).alias("commit"),
        F.element_at(langs, (lang_i + 1).cast("int")).alias("lang"),
        F.when(
            op_u >= p_delete, F.concat_ws("\n", *([body] * content_repeat))
        ).alias("content"),
        F.pmod(F.col("id") * F.lit(n_batches), F.lit(n_events)).alias("_arrival"),
    ).withColumn(
        "batch_id", F.floor(F.col("_arrival") * n_batches / F.lit(n_events)).cast("long")
    ).drop("_arrival")


def gen_embeddings_spark(
    spark: SparkSession,
    n_vectors: int,
    dim: int = 64,
    n_clusters: int = 1000,
    noise: float = 0.35,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Seeded clustered embeddings at arbitrary scale, fully distributed.

    Vector i = center(i % n_clusters) + noise·u(i), every component a pure
    xxhash64 expression of (id, j, seed) — no driver-side data, no numpy:
    the same recipe generates 10^9 vectors on a cluster.  Clustered (not
    uniform) geometry matters for ANN evaluation: top-k neighbors of a
    query are dominated by its cluster, so recall measures something a
    random corpus cannot.  Schema matches the driver's embeddings table:
    (vec_id bigint, embedding array<float>, label int).
    """
    df = spark.range(
        0, n_vectors, 1,
        partitions or spark.sparkContext.defaultParallelism,
    )
    cluster = F.pmod(F.col("id"), F.lit(n_clusters))

    def unit(col, j, salt):
        h = F.xxhash64(col, F.lit(j), F.lit(seed + salt))
        return F.pmod(h, F.lit(2001)) / 1000.0 - 1.0

    comps = [
        (unit(cluster, j, 100) + F.lit(noise) * unit(F.col("id"), j, 200))
        .cast("float")
        for j in range(dim)
    ]
    return df.select(
        F.col("id").alias("vec_id"),
        F.array(*comps).alias("embedding"),
        cluster.cast("int").alias("label"),
    )
