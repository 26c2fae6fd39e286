"""Deduplication operators.

1. **LWW (last-writer-wins) CDC dedup** — the north-star operator.  The
   reference's analogue is the duplicate-ID check (data_loader.py:660-692:
   same id + same signature = benign, keep one; different signature = error)
   combined with MERGE last-write-wins per id (data_loader.py:804-824).  At
   10^10 events the winner per ``(repo, path)`` must be computed without
   funneling a hot key through one task.

2. **Training-data dedup family** over a document corpus: exact (hash
   groupBy), MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine — see
   the sibling functions below and operators/similarity.py.

Scale notes (the reason for each design choice):

- ``lww_dedup`` default strategy is ``agg``: ``max_by(struct(payload),
  order_key)`` under ``groupBy(keys)``.  Spark's hash aggregate performs
  *partial* (map-side) aggregation before the shuffle, so a hot key is
  collapsed to one candidate row per map task before any data moves — the
  two-phase merge the north rule asks for, with Catalyst doing phase one.
- ``strategy='salted'`` makes the two phases explicit: groupBy(keys, salt)
  -> local winner, then groupBy(keys) -> global winner.  Useful when the
  payload is huge (partial agg buffers whole rows) and you want to bound
  the per-task state by salting first.
- ``strategy='window'`` (row_number over partitionBy(keys)): on Spark
  >=3.5 Catalyst's InferWindowGroupLimit rewrites the ``rn=1`` filter into
  a map-side partial top-1 (``WindowGroupLimit ... Partial`` before the
  exchange), making this plan skew-resistant too — and the measured
  fastest (bench/skew_bench.py).  With that rule disabled
  (``windowGroupLimitThreshold=-1``) it degrades to the classic one-task
  hot-key funnel (8x slower at a 29%-hot key), which is why
  ``strategy='auto'`` only picks it after checking the rule is active.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lww_order_key(seq_col: str = "seq", *tiebreakers: str) -> Column:
    """Total order for LWW: (seq, *tiebreakers) — SURVEY.md §7.4.

    Ties on ``seq`` (duplicate replays / equal-seq events) are broken
    deterministically by the tiebreaker columns (engine default:
    (seq, commit, sha2(content,256))), so any arrival order and any
    partitioning yield the same winner.
    """
    return F.struct(F.col(seq_col), *[F.col(c) for c in tiebreakers])


def _window_group_limit_active(df: DataFrame) -> bool:
    """True when Catalyst's InferWindowGroupLimit rule will rewrite a
    ``row_number()=1`` filter into a map-side partial top-1 (Spark >=3.5;
    ``spark.sql.optimizer.windowGroupLimitThreshold`` > 0)."""
    try:
        # no fallback default: on a build where the conf is unregistered
        # (Spark < 3.5 — no InferWindowGroupLimit) this RAISES and we
        # fail CLOSED; a supplied default would silently return 1000 and
        # dispatch the one-task-per-key funnel (self-review round 4)
        thr = int(
            df.sparkSession.conf.get(
                "spark.sql.optimizer.windowGroupLimitThreshold"
            )
        )
    except Exception:  # noqa: BLE001 — conf absent: rule doesn't exist
        return False
    return thr > 0


def choose_lww_strategy(
    df: DataFrame,
    keys: list[str],
    sample_frac: float = 0.01,
    hot_share_threshold: float = 0.05,
) -> str:
    """Pick the LWW plan from a cheap sampled key-frequency probe.

    MEASURED dispatch (bench/skew_bench.py; BENCH/BASELINE.md round 4,
    32M events, Zipf s=1.5, hottest key = 29% of all rows, local[32]):

    - hot key at/above ``hot_share_threshold`` -> **'agg'**: hash
      aggregate's partial (map-side) phase provably collapses the hot key
      to one candidate row per map task before anything moves — the
      north rule's two-phase merge with the map-task boundary acting as
      the salt.  Measured 2.3s vs 12.9s for the naive one-task-per-key
      window sort on identical input.  Chosen over the group-limit
      window (1.5s, within VM drift) because partial agg's skew collapse
      is structural, not a pattern-matched optimizer rewrite.
    - below the threshold -> **'window'** when InferWindowGroupLimit is
      active (the rn=1 filter becomes a map-side partial top-1 — the
      measured fastest plan), else **'agg'** (with the rule disabled the
      rn=1 window funnels each key through one reduce task: the classic
      skew hazard, 8x slower in the same heat).
    - 'salted' is never auto-chosen: its explicit phase-one salt pays an
      extra shuffle that partial agg makes redundant (3.5s in the same
      heat).  It remains available as the explicit, optimizer-independent
      two-phase plan.
    """
    s = df.sample(fraction=sample_frac, seed=7).groupBy(*keys).count()
    row = s.agg(
        F.max("count").alias("mx"), F.sum("count").alias("n")
    ).first()
    if not row or not row["n"]:
        return "agg"
    if row["mx"] / row["n"] >= hot_share_threshold:
        return "agg"
    return "window" if _window_group_limit_active(df) else "agg"


def lww_dedup(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    tiebreakers: list[str] | None = None,
    strategy: str = "agg",
    salt_buckets: int = 64,
) -> DataFrame:
    """One winning row per key by max (seq, *tiebreakers).

    Returns the full winning row (all columns of ``df``).
    ``strategy='auto'`` probes key skew (:func:`choose_lww_strategy`) and
    dispatches to 'agg' above the hot-share threshold, else to 'window'
    while InferWindowGroupLimit is active (falling back to 'agg') —
    never 'salted' and never the naive window; see the dispatcher's
    docstring for the measurements.
    """
    if strategy == "auto":
        strategy = choose_lww_strategy(df, keys)
    tiebreakers = tiebreakers or []
    order = lww_order_key(seq_col, *tiebreakers)
    payload_cols = [c for c in df.columns]

    if strategy == "agg":
        # Partial agg map-side => skew-resistant without explicit salt.
        winner = (
            df.groupBy(*keys)
            .agg(F.max_by(F.struct(*payload_cols), order).alias("_w"))
            .select("_w.*")
        )
        return winner

    if strategy == "salted":
        # Explicit two-phase: salt derived from the order key so same-key
        # rows spread across `salt_buckets` reducers in phase one.
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets))
        )
        local = (
            salted.groupBy(*keys, "_salt")
            .agg(F.max_by(F.struct(*payload_cols), order).alias("_w"))
            .select(*keys, "_w")
        )
        return (
            local.groupBy(*keys)
            .agg(
                F.max_by(
                    F.col("_w"),
                    F.struct(
                        F.col(f"_w.{seq_col}"),
                        *[F.col(f"_w.{c}") for c in tiebreakers],
                    ),
                ).alias("_w")
            )
            .select("_w.*")
        )

    if strategy == "window":
        w = Window.partitionBy(*keys).orderBy(
            F.col(seq_col).desc(), *[F.col(c).desc() for c in tiebreakers]
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    raise ValueError(f"unknown lww strategy: {strategy}")


# ---------------------------------------------------------------------------
# Document-corpus dedup family (training-data pipeline operators)
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by content hash: keep the min-id representative per md5.

    Output: (rep_id, content_md5, dup_count).  Pure shuffle-on-hash groupBy
    with map-side combine; scales linearly.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("rep_id", "content_md5", "dup_count")
    )


def _shingles(text_col: Column, k: int = 5) -> Column:
    """Word k-shingles as an array<string> (lower-cased, whitespace-split)."""
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))).otherwise(
        F.array(F.array_join(words, " "))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 5,
    repartition: bool = True,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per doc: num_hashes 64-bit min values over shingles.

    All JVM-side: shingle -> hash(shingle, seed_i) -> array_min.  No
    Python in the loop; one map stage.  Two scale details:

    - the shingle array is materialized ONCE per row (hash the shingles to
      longs first), so the num_hashes min-expressions reuse it instead of
      re-building 100+ strings per row per hash function;
    - compute-heavy-but-small inputs (one parquet file) are repartitioned
      to the session's parallelism — a single input split must not
      serialize the whole corpus onto one core.

    ``hash_mode='portable'`` uses the md5-derived cross-engine primitive
    (functions/porthash.py) so the DuckDB oracle can replicate the full
    algorithm value-for-value; 'xxhash64' is the codegen scale path.

    Output: (id, sig: array<long>).
    """
    from ..functions.porthash import family_member, hash_pair_from_digest

    if repartition:
        sc = df.sparkSession.sparkContext
        df = df.repartition(sc.defaultParallelism)
    # Plan shape (round 6): explode the shingles and take the num_hashes
    # mins in ONE whole-stage-codegen hash aggregate instead of
    # num_hashes array_min(transform(...)) passes.  Higher-order-function
    # lambdas are evaluated by the INTERPRETED expression evaluator (no
    # codegen, no subexpression elimination), so the old shape paid
    # interpreted per-element eval 33x per shingle AND re-computed the md5
    # inside the lambda; exploding moves the base hash into a codegen'd
    # projection (one md5/xxhash64 per shingle, guaranteed by hashing the
    # digest column) and the mins into a codegen'd partial aggregate.
    # Same values: min over the exploded multiset == array_min over the
    # array, member arithmetic unchanged (measured ~6x on the portable
    # leg, see OPTIMIZATION_r06.md).  A NULL shingle (NULL text) yields a
    # NULL-sig row in both shapes: explode keeps NULL *elements* (only
    # NULL/empty arrays drop rows, and _shingles never returns those).
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(F.col(text_col), shingle_k)).alias("_s"),
    )
    if hash_mode == "portable":
        # Kirsch-Mitzenmacher basis from ONE md5 per shingle; each family
        # member is a multiply-add — bit-identical in DuckDB.
        hashed = sh.select(
            "id", hash_pair_from_digest(F.md5(F.col("_s"))).alias("_p")
        )
        members = [family_member(F.col("_p"), i) for i in range(num_hashes)]
    else:
        hashed = sh.select("id", F.xxhash64(F.col("_s")).alias("_h"))
        members = [F.xxhash64(F.col("_h"), F.lit(i)) for i in range(num_hashes)]
    agg = hashed.groupBy("id").agg(
        *[F.min(m).alias(f"_m{i}") for i, m in enumerate(members)]
    )
    return agg.select(
        "id", F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int = 200,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs via MinHash banding + bucket join.

    shingle -> minhash -> split signature into ``bands`` bands -> hash each
    band -> explode (band_id, band_hash) -> self-join on the bucket ->
    estimate Jaccard from signature agreement -> filter by threshold.

    Scale discipline (what keeps this linear-ish at 100 TB):

    - buckets larger than ``max_bucket_size`` are dropped before the
      self-join — an oversized bucket is non-discriminative (stop-phrase
      shingles) and would contribute O(size^2) candidate pairs;
    - the self-join and pair-dedup carry ONLY ids; the 32-long signatures
      are re-attached to the deduplicated pairs afterwards;
    - the signature DataFrame is MATERIALIZED ONCE via localCheckpoint:
      the plan references it four times (banding -> bucket-size agg,
      banding -> capped join, and both sides of the signature re-attach),
      and without materialization Spark recomputes the
      shingle->num_hashes-min subtree — by far the most expensive stage —
      once per reference (4 references eliminated; measured ~30x on the
      xx64 leg at sf0.1 where the subtree dominated, see
      BENCH/BASELINE.md round 5).  Signatures are tiny
      ((id, num_hashes x long) ~ 300 B/row vs multi-KB documents, ~3 GB
      per 10^7 docs with overhead) and spill gracefully.
      ``localCheckpoint`` rather than ``persist``: cache entries are
      pinned by the CacheManager until an explicit unpersist — in a
      long-lived session every call would leak its signature cache —
      while a checkpointed RDD is released by the ContextCleaner as soon
      as the result DataFrame is garbage-collected (advice round 5).

    Output: (id_a, id_b, est_jaccard) with id_a < id_b, distinct.
    """
    from ..functions.porthash import hex_int

    rows = num_hashes // bands
    band_hash_fn = hex_int if hash_mode == "portable" else F.xxhash64
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, hash_mode=hash_mode
    ).localCheckpoint(eager=False)
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    band_hash_fn(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at(F.col("sig"), b * rows + r + 1).cast(
                                    "string"
                                )
                                for r in range(rows)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    bucket_sizes = banded.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("_n")
    )
    capped = banded.join(
        bucket_sizes.filter(F.col("_n") <= max_bucket_size).select(
            "band_id", "band_hash"
        ),
        ["band_id", "band_hash"],
    )
    a = capped.select(F.col("id").alias("id_a"), "band_id", "band_hash")
    b = capped.select(F.col("id").alias("id_b"), "band_id", "band_hash")
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.lit(float(num_hashes))
    ).alias("est_jaccard")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", est)
        .filter(F.col("est_jaccard") >= jaccard_threshold)
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc, JVM-side.

    Each word hashes to 64 bits; the fingerprint bit_i = sign of the sum of
    (+1/-1) over word-hash bit_i.  Expressed with aggregate() over the word
    array — no shuffle, one map stage (repartitioned to session parallelism
    so a single input split doesn't serialize the corpus onto one core).
    Output: (id, simhash: long).
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # accumulate per-bit counts: array of `bits` ints
    zero = F.array_repeat(F.lit(0), bits)

    def step(acc, w):
        h = F.xxhash64(w)
        deltas = F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for i in range(bits)
            ]
        )
        return F.zip_with(acc, deltas, lambda a, d: a + d)

    counts = F.aggregate(words, zero, step)
    # bit i weight as a signed-long literal (bit 63 = sign bit)
    weights = [(1 << i) if i < 63 else -(1 << 63) for i in range(bits)]
    bit_vals = F.zip_with(
        counts,
        F.array(*[F.lit(w).cast("long") for w in weights]),
        lambda c, wgt: F.when(c > 0, wgt).otherwise(F.lit(0).cast("long")),
    )
    fingerprint = F.aggregate(
        bit_vals, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )
    return df.select(F.col(id_col).alias("id"), fingerprint.alias("simhash"))


def simhash_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Cross-engine-verifiable SimHash (same algorithm, portable word hash).

    Word hash = first 8 md5 hex chars as int (functions/porthash.py), word
    stream = non-empty whitespace tokens of lower(trim(text)), fingerprint
    bit_i set iff strictly more word hashes have bit_i set than clear.
    Replicated term-for-term by the DuckDB oracle (hash_queries.SIMHASH_SQL).
    Output: (id, simhash: long).  Still one JVM map stage — the md5 is
    ~3x the cost of xxhash64 but stays in codegen.
    """
    from ..functions.porthash import hex_int

    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    # materialize the hashed-word array ONCE per row; the 32 per-bit counts
    # below reuse it instead of re-hashing every word per bit
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda t: hex_int(t, 8)).alias("_hs"),
    )
    n = F.size(F.col("_hs"))

    def _bit_set(i):  # unary lambda: 2-arg form would bind the array index
        return lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1

    terms = []
    for i in range(bits):
        set_cnt = F.size(F.filter(F.col("_hs"), _bit_set(i)))
        terms.append(
            F.when((n > 0) & (set_cnt * 2 > n), F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    fingerprint = terms[0]
    for t in terms[1:]:
        fingerprint = fingerprint + t
    return hashed.select("id", fingerprint.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs sharing >=1 n-gram.

    explode(distinct n-grams) -> self-join on the n-gram -> count shared ->
    |A ∪ B| = |A| + |B| - shared.  The join is equi on the n-gram; frequency
    cap (drop n-grams appearing in > 1000 docs) bounds the blow-up on
    stop-phrase n-grams at scale.

    ``grams`` is materialized once via localCheckpoint: the plan
    references it five times (per-doc sizes, gram frequencies, the capped
    set, and both sides of the self-join) and each reference would
    otherwise re-split and re-shingle every document — the same
    compute-once discipline as :func:`minhash_lsh_dedup`'s signatures.
    localCheckpoint rather than persist because the exploded (id, gram)
    relation is several times the corpus size and a CacheManager entry
    would pin it for the whole session (advice round 5: the worst of the
    two leaks); a checkpointed RDD spills the same way (MEMORY_AND_DISK)
    but is released by the ContextCleaner once the result is dropped.
    Output: (id_a, id_b, jaccard).
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(_shingles(F.col(text_col), n))).alias("gram"),
    ).localCheckpoint(eager=False)
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df_"))
    grams_capped = grams.join(
        F.broadcast(freq.filter(F.col("df_") <= 1000).select("gram")), "gram"
    )
    a = grams_capped.select(F.col("id").alias("id_a"), "gram")
    b = grams_capped.select(F.col("id").alias("id_b"), "gram")
    shared = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("shared")
                / (F.col("na") + F.col("nb") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
