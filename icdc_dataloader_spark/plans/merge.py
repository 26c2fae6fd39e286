"""MERGE INTO planner: set-oriented upsert/new/delete over a LakeTable.

Replaces the reference's per-row Cypher writes (one bolt round-trip per row,
data_loader.py:901-947) with one copy-on-write MERGE per micro-batch:

- ``UPSERT_MODE`` (MERGE ... ON CREATE SET / ON MATCH SET,
  data_loader.py:804-824)  -> op='upsert': LWW winner per key wins.
- ``NEW_MODE`` (CREATE, abort if exists, data_loader.py:787-802,912-918)
  -> op='new': an event whose key is currently live is quarantined to the
  errors relation (reason ``node_exists_in_new_mode``) instead of aborting
  the batch; the rest of the batch applies.
- ``DELETE_MODE`` (data_loader.py:919-922) -> op='delete': a tombstone row
  is stored so late (lower-seq) upserts arriving in later batches still
  lose to the delete — global LWW independent of batch assignment.

Physical plan, designed for 10^10 events:

1. bucket the batch by key hash; collect the touched bucket ids (<= the
   table's n_buckets, driver-side integers only);
2. scan ONLY the touched buckets' data files (file pruning via the snapshot
   manifest — the Spark analogue of the reference's id indexes,
   create_index.py:60-95);
3. union current ∪ batch and take the per-key max_by((seq, tiebreakers))
   winner — partial aggregation map-side handles hot-key skew (the explicit
   two-phase salted variant is operators/dedup.py);
4. rewrite touched buckets, carry every untouched file forward in the new
   snapshot, commit atomically keyed by batch_id (idempotent re-apply).

The timestamps the reference sets in ON CREATE/ON MATCH (datetime(),
data_loader.py:822-823) are deliberately replaced by ``_seq`` lineage
columns (_created_seq/_updated_seq) so replays are bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lake import LakeTable, bucket_expr, _align

INTERNAL_COLS = ["_seq", "_op", "_bucket", "_created_seq", "_updated_seq"]

OP_UPSERT = "upsert"
OP_NEW = "new"
OP_DELETE = "delete"


def table_schema(payload: T.StructType) -> T.StructType:
    """Physical table schema = payload + CDC lineage columns."""
    fields = list(payload.fields) + [
        T.StructField("_seq", T.LongType(), True),
        T.StructField("_op", T.StringType(), True),
        T.StructField("_bucket", T.IntegerType(), True),
        T.StructField("_created_seq", T.LongType(), True),
        T.StructField("_updated_seq", T.LongType(), True),
    ]
    return T.StructType(fields)


def _lww_order(seq_col: str, tiebreakers: list[str]) -> F.Column:
    return F.struct(
        F.col(seq_col),
        *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in tiebreakers],
    )


def resolve(
    spark: SparkSession,
    lake: LakeTable,
    version: int | None = None,
    buckets: list[int] | None = None,
    project: list[str] | None = None,
    bucket_partition: bool = False,
) -> DataFrame:
    """Current table rows with merge-on-read deltas resolved.

    COW snapshots (no delta files) are returned as-is — zero overhead.
    With deltas, one per-key LWW aggregation over base ∪ deltas (same total
    order as the write path; tiebreakers from table metadata).

    Plan shape (scale-critical — this runs over the whole table at compact
    and over touched buckets at every MoR read).  The delete→recreate
    lineage reset needs the per-key tombstone watermark.  A window over the
    full payload forces a SORT of EVERY row in one reduce-side pass whose
    chunk size grows with (rows / shuffle partitions) — at low parallelism
    that spilled to disk (measured: 119s of a 177s local[2] compact).
    Instead the watermark comes from a column-pruned tombstone-only
    aggregate (reads 3 columns of delete rows only) joined back — AQE
    broadcasts it when small — and the winner comes from a partial-agg
    max_by whose map-side sort is bounded by the input SPLIT size
    (~128MB), independent of parallelism, and which collapses duplicate
    keys before any data moves.  Measured at local[8]: 15.7s vs 19.3s
    (window) for an 8M-row compact; the local[2] spill is gone entirely.
    """
    df = lake.read(spark, version=version, buckets=buckets)
    key_cols = lake.key_cols()
    if project is not None:
        # caller only needs these columns (e.g. changes_between's OLD side
        # wants keys + _seq): narrow the struct so Catalyst prunes the
        # parquet scan instead of shipping every payload byte through the
        # winner aggregation
        needed = [
            c
            for c in dict.fromkeys(
                list(project)
                + key_cols
                + ["_seq", "_op", "_created_seq"]
                + lake.tiebreakers()
            )
            if c in df.columns
        ]
        df = df.select(*needed)
    deltas = lake.delta_files(version)
    if buckets is not None:
        # bucket-targeted compaction makes mixed states the norm: a
        # bucket-restricted read over delta-free buckets must not pay the
        # tombstone-watermark join + LWW aggregation just because SOME
        # OTHER bucket still holds deltas (advice round 4)
        bset = set(buckets)
        deltas = [f for f in deltas if f["bucket"] in bset]
    if not deltas:
        if bucket_partition:
            return df.repartition(lake.n_buckets(), "_bucket")
        return df

    order = _lww_order("_seq", lake.tiebreakers())
    payload = F.struct(*df.columns)
    # created lineage must RESET across a delete->recreate: only rows at or
    # after the key's latest tombstone count toward _first_seq (the COW path
    # gets this for free because the tombstone physically replaces the old
    # row; computing min over ALL non-delete rows here resurrected the
    # pre-delete lineage).
    if bucket_partition:
        # Compaction path (round 6).  The old shape paid for the tombstone
        # watermark with a per-key aggregate JOINED back — planned as a
        # sort-merge join whose ENSURE_REQUIREMENTS exchange shuffled the
        # full payload by null-safe key, followed by the winner
        # aggregation's exchange and compact()'s repartition(_bucket):
        # three payload exchanges and repeated full sorts.  Here the
        # payload moves ONCE: repartition by _bucket, then the watermark
        # is a window over (_bucket, keys) — HashPartitioning(_bucket)
        # satisfies the window's clustered distribution because _bucket is
        # a pure function of the bucket columns, so no further exchange —
        # and the winner SortAggregate groups on (_bucket, keys), reusing
        # both the partitioning and the window's (bucket, keys) sort
        # order.  Window partitioning groups NULL key components together
        # exactly like the old eqNullSafe join did.  Output lands already
        # clustered one bucket per partition for the write (guide §2.4:
        # 3 Exchange -> 1; see OPTIMIZATION_r06.md for the measured A/B).
        from pyspark.sql.window import Window

        main = df.repartition(lake.n_buckets(), "_bucket")
        wspec = Window.partitionBy("_bucket", *key_cols)
        main = main.withColumn(
            "_del_max",
            F.max(
                F.when(F.col("_op") == OP_DELETE, F.col("_seq"))
            ).over(wspec),
        )
        group_cols = ["_bucket"] + key_cols
    else:
        # read-path shape (unchanged): column-pruned tombstone aggregate
        # joined back — AQE broadcasts it when small, and the winner
        # aggregation's map-side partial phase bounds per-task sort state
        # by the input split size (see the round-5 measurements above)
        dels = (
            df.filter(F.col("_op") == OP_DELETE)
            .groupBy(*key_cols)
            .agg(F.max("_seq").alias("_del_max"))
            .select(
                *[F.col(k).alias(f"_dk_{k}") for k in key_cols], "_del_max"
            )
        )
        # groupBy buckets NULL key components together, so the watermark
        # join must too: null-unsafe equality would detach a NULL-keyed
        # tombstone from its rows and silently skip their delete->recreate
        # lineage reset
        cond = None
        for k in key_cols:
            c = F.col(k).eqNullSafe(F.col(f"_dk_{k}"))
            cond = c if cond is None else (cond & c)
        main = df.join(dels, cond, "left").drop(
            *[f"_dk_{k}" for k in key_cols]
        )
        group_cols = list(key_cols)
    alive_after_delete = (F.col("_op") != OP_DELETE) & (
        F.col("_del_max").isNull() | (F.col("_seq") > F.col("_del_max"))
    )
    return (
        main.groupBy(*group_cols)
        .agg(
            F.max_by(payload, order).alias("_w"),
            F.min(
                F.when(alive_after_delete, F.col("_created_seq"))
            ).alias("_first_seq"),
        )
        .select("_w.*", "_first_seq")
        .withColumn(
            "_created_seq", F.coalesce(F.col("_first_seq"), F.col("_created_seq"))
        )
        .drop("_first_seq")
    )


def changed_buckets(
    lake: LakeTable, v_from: int, v_to: int
) -> list[int]:
    """Hash buckets whose file set changed in (v_from, v_to] —
    driver-side manifest diff, no Spark job.  A downstream consumer only
    needs to re-read these buckets: at 100 TB an incremental batch
    typically touches a small fraction of them.  Compaction rewrites count
    as touches (superset — always safe).

    Both directions of the diff matter: files ADDED (new data) and files
    REMOVED (a bucket that compacted/GC'd/wiped down to zero files leaves
    nothing behind at v_to — self-review round 4: an added-only diff
    silently dropped the delete events for every key in such a bucket).
    """
    old_files = lake.snapshot(v_from)["files"]
    new_files = lake.snapshot(v_to)["files"]
    old_paths = {f["path"] for f in old_files}
    new_paths = {f["path"] for f in new_files}
    return sorted(
        {f["bucket"] for f in new_files if f["path"] not in old_paths}
        | {f["bucket"] for f in old_files if f["path"] not in new_paths}
    )


def changes_between(
    spark: SparkSession,
    lake: LakeTable,
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """Incremental change feed between two snapshots (the CONSUME side of
    the CDC engine — the Iceberg incremental-read analogue): one row per
    key whose live state differs between ``v_from`` and ``v_to``.

    Output: key columns, ``change_type`` ('insert' | 'update' |
    'delete'), and the v_to payload (NULL payload for deletes).

    Plan shape: both states are resolved ONLY over :func:`changed_buckets`
    (file-level pruning from manifests — untouched buckets are never
    opened), then a single key full-outer join; winners are compared by
    ``_seq`` (same key + same winning seq == same row, by LWW totality).
    A key deleted before v_from and still dead at v_to emits nothing,
    even if its tombstone was GC'd in between.
    """
    v_to = lake.latest_version() if v_to is None else v_to
    # a consumer that lagged past vacuum retention cannot resume
    # incrementally — fail with the clear contract error (best-effort at
    # plan time; see LakeTable.ensure_retained)
    lake.ensure_retained(
        v_from,
        hint="Re-bootstrap from read_state() and resume the feed from "
             "the current version.",
    )
    bks = changed_buckets(lake, v_from, v_to)
    key_cols = lake.key_cols()
    payload_cols = [
        f.name for f in lake.schema(v_to).fields
        if f.name not in INTERNAL_COLS and f.name not in key_cols
    ]

    # OLD side only contributes keys + winning seq: project so the scan
    # reads no payload bytes (Catalyst prunes the parquet columns)
    old = (
        resolve(spark, lake, version=v_from, buckets=bks,
                project=list(key_cols) + ["_seq"])
        .filter(F.col("_op") != OP_DELETE)
        .select(*key_cols, F.col("_seq").alias("_old_seq"))
    )
    new = (
        resolve(spark, lake, version=v_to, buckets=bks)
        .filter(F.col("_op") != OP_DELETE)
        .select(*key_cols, F.col("_seq").alias("_new_seq"), *payload_cols)
    )
    # NULL-keyed rows are first-class in this lake (resolve joins tombstone
    # watermarks with eqNullSafe above): the old/new states must be matched
    # null-safely too, else a live NULL-keyed key present in both snapshots
    # fails to match itself and double-reports as insert+delete
    old = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols], "_old_seq"
    )
    cond = None
    for k in key_cols:
        c = F.col(k).eqNullSafe(F.col(f"_ok_{k}"))
        cond = c if cond is None else (cond & c)
    joined = new.join(old, cond, "full_outer")
    change = (
        F.when(F.col("_old_seq").isNull(), F.lit("insert"))
        .when(F.col("_new_seq").isNull(), F.lit("delete"))
        .when(F.col("_new_seq") != F.col("_old_seq"), F.lit("update"))
    )
    # delete rows carry the key from the OLD side only; a genuinely-NULL
    # key component is NULL on whichever side matched, so the coalesce of a
    # matched pair is that same value
    key_out = [
        F.when(F.col("_new_seq").isNull(), F.col(f"_ok_{k}"))
        .otherwise(F.col(k))
        .alias(k)
        for k in key_cols
    ]
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_out, "change_type", *payload_cols)
    )


def read_state(spark: SparkSession, lake: LakeTable, version: int | None = None) -> DataFrame:
    """User-facing current state: live rows only, lineage columns dropped."""
    df = resolve(spark, lake, version=version)
    return df.filter(F.col("_op") != OP_DELETE).drop(*[c for c in INTERNAL_COLS if c in df.columns])


def merge_into(
    spark: SparkSession,
    lake: LakeTable,
    batch_df: DataFrame,
    seq_col: str = "_seq",
    op_col: str = "_op",
    tiebreakers: list[str] | None = None,
    batch_id=None,
    error_sink=None,
    touched: list[int] | None = None,
) -> dict:
    """Apply one CDC batch. Returns {'version', 'metrics', 'noop', 'errors'}.

    ``batch_df`` carries payload columns (a subset of the table payload is
    fine — schema-evolution alignment fills NULLs), ``_seq`` and ``_op``.
    ``touched``: the batch's hash buckets if the caller already knows them
    (skips one aggregation job).
    """
    if batch_id is not None and lake.is_batch_committed(batch_id):
        return {
            "version": lake.latest_version(),
            "metrics": {},
            "noop": True,
            "errors": None,
        }

    key_cols = lake.key_cols()
    n_buckets = lake.n_buckets()
    schema = lake.schema()
    tiebreakers = tiebreakers or []

    batch = batch_df.withColumn("_bucket", bucket_expr(lake.bucket_cols(), n_buckets))
    batch = batch.withColumn("_created_seq", F.col(seq_col)).withColumn(
        "_updated_seq", F.col(seq_col)
    )
    # materialize the staged batch once: the bucket collect, the NEW-conflict
    # join and the LWW union all reuse it instead of recomputing its lineage
    batch = _align(batch, schema).persist()

    if touched is None:
        touched = sorted(
            r["_bucket"] for r in batch.select("_bucket").distinct().collect()
        )
    snap = lake.snapshot()
    if not touched:
        batch.unpersist()
        version = lake.commit(
            [], snap["files"], operation="merge-empty", batch_id=batch_id, metrics={}
        )
        return {"version": version, "metrics": {}, "noop": False, "errors": None}

    current = lake.read(spark, buckets=touched)

    # --- single-aggregation LWW merge ----------------------------------------
    # ONE shuffle of the payload per batch: current ∪ batch grouped by key,
    # with the global winner, the batch-side winner (for NEW-conflict
    # detection), the (unique) current row, liveness and created-lineage all
    # computed in the same hash aggregate.  Map-side partial aggregation is
    # the first phase of the two-phase (salted) merge — a hot key collapses
    # to one candidate per map task before any data moves.
    cur_tagged = current.withColumn("_src", F.lit("cur"))
    bat_tagged = batch.withColumn("_src", F.lit("batch"))
    unioned = cur_tagged.unionByName(bat_tagged)

    payload_cols = [f.name for f in schema.fields] + ["_src"]
    payload = F.struct(*payload_cols)
    order = F.struct(
        F.col(seq_col),
        *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in tiebreakers],
    )
    is_batch = F.col("_src") == "batch"
    is_cur = F.col("_src") == "cur"
    agg = unioned.groupBy(*key_cols).agg(
        F.max_by(payload, order).alias("_w"),
        F.max_by(F.when(is_batch, payload), F.when(is_batch, order)).alias("_bw"),
        # <=1 current row per key; max_by because max() cannot order structs
        # that contain map columns (edge tables carry rel_props maps)
        F.max_by(F.when(is_cur, payload), F.when(is_cur, F.lit(1))).alias("_cw"),
        F.max(
            F.when(is_cur & (F.col(op_col) != OP_DELETE), 1).otherwise(0)
        ).alias("_had_live"),
        F.min(F.when(F.col(op_col) != OP_DELETE, F.col("_created_seq"))).alias(
            "_first_seq"
        ),
    )
    # NEW_MODE (W2, data_loader.py:912-918): if the batch's winning event is
    # a 'new' on a live key, the whole batch contribution for that key is
    # rejected — the current row stands, and an error row is emitted.
    conflict = (
        F.col("_bw").isNotNull()
        & (F.col("_bw")[op_col] == OP_NEW)
        & (F.col("_had_live") == 1)
    )
    winners = agg.select(
        *key_cols,
        F.when(conflict, F.col("_cw")).otherwise(F.col("_w")).alias("_w"),
        conflict.alias("_conflict"),
        F.col("_bw").isNotNull().alias("_has_batch"),
        "_had_live",
        "_first_seq",
    ).select(
        "_w.*", "_conflict", "_has_batch", "_had_live", "_first_seq"
    )
    # preserve created lineage across updates (ON CREATE SET created, W1)
    winners = winners.withColumn(
        "_created_seq", F.coalesce(F.col("_first_seq"), F.col("_created_seq"))
    )
    winners = winners.persist()

    errors = winners.filter(F.col("_conflict")).select(
        *key_cols,
        F.lit("node_exists_in_new_mode").alias("reason"),
        F.lit("error").alias("severity"),
    )
    if error_sink is not None:
        error_sink(errors)

    m = winners.agg(
        F.sum(
            F.when(
                (F.col("_src") == "batch")
                & (F.col(op_col) != OP_DELETE)
                & (F.col("_had_live") == 0),
                1,
            ).otherwise(0)
        ).alias("rows_inserted"),
        F.sum(
            F.when(
                (F.col("_src") == "batch")
                & (F.col(op_col) != OP_DELETE)
                & (F.col("_had_live") == 1),
                1,
            ).otherwise(0)
        ).alias("rows_updated"),
        F.sum(
            F.when(
                (F.col("_src") == "batch")
                & (F.col(op_col) == OP_DELETE)
                & (F.col("_had_live") == 1),
                1,
            ).otherwise(0)
        ).alias("rows_deleted"),
        F.sum(F.when(F.col("_src") == "cur", 1).otherwise(0)).alias("rows_unchanged"),
    ).collect()[0]
    metrics = {k: int(m[k] or 0) for k in m.asDict()}

    out = _align(
        winners.drop("_src", "_had_live", "_first_seq", "_conflict", "_has_batch"),
        schema,
    )
    # co-locate by bucket for the write; AQE coalesces small outputs
    out = out.repartition(max(len(touched), 1), "_bucket")

    new_version = lake.latest_version() + 1
    new_files = lake.write_data_files(out, new_version, schema)
    winners.unpersist()
    batch.unpersist()

    touched_set = set(touched)
    carried = [f for f in snap["files"] if f["bucket"] not in touched_set]
    version = lake.commit(
        new_files, carried, operation="merge", batch_id=batch_id, metrics=metrics
    )
    return {"version": version, "metrics": metrics, "noop": False, "errors": errors}


# ---------------------------------------------------------------------------
# Merge-on-read: append deltas, resolve at read, compact on threshold
# ---------------------------------------------------------------------------


def _mm3_mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
    k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
    return (k1 * 0x1B873593) & 0xFFFFFFFF


def _mm3_mix_h1(h1: int, k1: int) -> int:
    h1 = (h1 ^ k1) & 0xFFFFFFFF
    h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
    return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF


def _mm3_fmix(h1: int, length: int) -> int:
    h1 = (h1 ^ length) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    return h1 ^ (h1 >> 16)


def _mm3_hash_long(value: int, seed: int) -> int:
    """Murmur3 32-bit hash of one LongType value, as Spark's Murmur3Hash
    computes it (two 4-byte blocks, low word first — Spark
    sql/catalyst hash.scala `hashLong`, same algorithm as Guava's
    Murmur3_x86_32; public source)."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mm3_mix_h1(seed & 0xFFFFFFFF, _mm3_mix_k1(v & 0xFFFFFFFF))
    h1 = _mm3_mix_h1(h1, _mm3_mix_k1((v >> 32) & 0xFFFFFFFF))
    return _mm3_fmix(h1, 8)


def shuffle_partition_id(values: list[int], n_partitions: int) -> int:
    """The shuffle partition `repartition(n_partitions, *long_cols)`
    assigns to a row with these LongType column values:
    pmod(murmur3(values, seed=42), n) — HashPartitioning's
    partitionIdExpression (Spark sql/catalyst partitioning.scala; public
    source).  Lets the driver PLAN partition placement without a job."""
    h = 42
    for v in values:
        h = _mm3_hash_long(v, h)
    if h >= 1 << 31:  # Spark's hash is a signed int32
        h -= 1 << 32
    return ((h % n_partitions) + n_partitions) % n_partitions


def _distinct_partition_salts(
    bucket: int, k: int, n_partitions: int, used: set[int] | None = None,
) -> list[int]:
    """k salt values for ``bucket`` whose (bucket, salt) rows land in k
    DISTINCT shuffle partitions — raw group ids can murmur3-collide,
    merging two of a hot bucket's groups back into one task and re-growing
    the straggler the salt exists to remove.

    ``used``: pass ONE set across all hot buckets of a write so the
    avoidance also holds BETWEEN them — two different hot buckets' groups
    sharing a task halves the bound just like an intra-bucket collision.
    When every partition is taken the set resets (separation is then
    physically impossible; k hot groups > n_partitions)."""
    vals: list[int] = []
    if used is None:
        used = set()
    c = 0
    while len(vals) < k and c < 1000 * k:
        pid = shuffle_partition_id([bucket, c], n_partitions)
        if pid not in used:
            used.add(pid)
            vals.append(c)
            if len(used) == n_partitions:  # no more distinct pids exist
                used.clear()
        c += 1
    while len(vals) < k:  # degenerate guard (tiny n_partitions)
        vals.append(vals[0])
    return vals


def append_delta(
    spark: SparkSession,
    lake: LakeTable,
    batch_df: DataFrame,
    seq_col: str = "_seq",
    op_col: str = "_op",
    tiebreakers: list[str] | None = None,
    batch_id=None,
    error_sink=None,
    pre_dedup: bool = True,
    touched: list[int] | None = None,
    has_new: bool | None = None,
    colocate: bool = True,
    colocate_salt: int = 1,
    salt_buckets: dict[int, int] | list[int] | None = None,
) -> dict:
    """MoR apply: write the batch as delta files — NO base rewrite.

    This is the 10^10-scale ingest path: per-batch work is proportional to
    the BATCH, not the table.  The per-key winner is materialized lazily by
    :func:`resolve` / :func:`compact` using the same (seq, tiebreakers)
    total order, so the final state is identical to the COW path (tested).

    - ``pre_dedup``: explicit key-salted two-phase LWW inside the batch
      before writing (bounds delta size by the batch's key count — the hot
      path of the north rule's salting mechanism).
    - NEW_MODE events require apply-time liveness: if (and only if) the
      batch contains op='new', the current state of the touched buckets is
      resolved (a read, not a rewrite) and every key whose batch-winner is
      a conflicting 'new' is stripped from the delta (same rule as COW).
    """
    if batch_id is not None and lake.is_batch_committed(batch_id):
        return {"version": lake.latest_version(), "metrics": {}, "noop": True,
                "errors": None}

    from ..operators.dedup import lww_dedup

    key_cols = lake.key_cols()
    n_buckets = lake.n_buckets()
    schema = lake.schema()
    tiebreakers = tiebreakers or lake.tiebreakers()

    batch = batch_df.withColumn("_bucket", bucket_expr(lake.bucket_cols(), n_buckets))
    batch = batch.withColumn("_created_seq", F.col(seq_col)).withColumn(
        "_updated_seq", F.col(seq_col)
    )
    batch = _align(batch, schema)
    if pre_dedup:
        batch = lww_dedup(
            batch, key_cols, seq_col=seq_col, tiebreakers=tiebreakers,
            strategy="salted",
        )

    # ONE Spark job on the common path: the write itself.  NEW-op presence
    # is observed during that job; per-bucket lineage comes from the
    # written files' parquet footers (no extra aggregation jobs).
    from pyspark.sql import Observation

    obs = None
    if has_new is None:
        obs = Observation()
        batch = batch.observe(
            obs,
            F.max(
                F.when(F.col(op_col) == OP_NEW, 1).otherwise(0)
            ).alias("has_new"),
        )

    # ``colocate``: shuffle the batch so each bucket is one file (read- and
    # footer-friendly) vs write straight from the input splits (zero
    # shuffle, one file per task×bucket — compaction folds them).
    # ``colocate_salt`` > 1 splits each bucket's write across that many
    # tasks (hot-BUCKET skew: a key carrying p% of the batch makes its
    # bucket's single write task the stage straggler; salting bounds the
    # straggler at ~p/salt while files-per-bucket stays <= salt — the
    # manifests and resolve handle multi-file buckets natively).  The
    # physical bucket assignment is untouched: files land in their _pb
    # dir via partitionBy regardless of which task writes them.
    # ``salt_buckets`` targets the split: only the listed (hot) buckets
    # pay the files-per-bucket tax, cold buckets keep exactly one file —
    # at thousands of buckets a global salt multiplies EVERY bucket's
    # file count to shave one straggler, which is the wrong trade.
    if colocate:
        if colocate_salt > 1:
            if salt_buckets is not None:
                # TARGETED split (the colocate_salt='auto' path): only the
                # listed hot buckets split — each with its OWN k (a dict
                # {bucket: k}; a list means uniform k=colocate_salt) so a
                # barely-hot bucket isn't over-split to the hottest one's
                # degree — and every hot bucket's k salt values are chosen
                # driver-side (one shared `used` set) so all hot groups of
                # the write provably land in DISTINCT shuffle partitions;
                # murmur3 can otherwise merge two groups into one task and
                # silently re-grow the straggler.  Cold buckets keep
                # salt 0: one task, one file, no tax.
                hot = (
                    {int(b): int(k) for b, k in salt_buckets.items()}
                    if isinstance(salt_buckets, dict)
                    else {int(b): colocate_salt for b in salt_buckets}
                )
                n_part = n_buckets
                taken: set[int] = set()
                expr = None
                for b, k in sorted(hot.items()):  # empty -> salt 0 all
                    k = max(2, min(k, n_part))
                    remap = F.element_at(
                        F.array(*[
                            F.lit(v).cast("long") for v in
                            _distinct_partition_salts(b, k, n_part, taken)
                        ]),
                        (F.pmod(F.xxhash64(F.col(seq_col)), F.lit(k))
                         + 1).cast("int"),
                    )
                    w = F.col("_bucket") == b
                    expr = (F.when(w, remap) if expr is None
                            else expr.when(w, remap))
                salt = (expr.otherwise(F.lit(0).cast("long"))
                        if expr is not None else F.lit(0).cast("long"))
            else:
                # GLOBAL split (fixed colocate_salt on every bucket):
                # per-bucket remap would need an n_buckets-branch
                # expression and widening the partition count multiplies
                # scheduled tasks at thousands of buckets, so this path
                # keeps n_buckets partitions and accepts probabilistic
                # collisions (measured: a salt-8 split can read as /4 —
                # BENCH/BASELINE.md).  The auto/targeted path above is
                # the exact, recommended one.
                n_part = n_buckets
                salt = F.pmod(
                    F.xxhash64(F.col(seq_col)), F.lit(colocate_salt)
                ).cast("long")
            out = batch.repartition(
                n_part, F.col("_bucket").cast("long"), salt
            )
        else:
            out = batch.repartition(n_buckets, "_bucket")
    else:
        out = batch
    new_version = lake.latest_version() + 1
    new_files = lake.write_data_files(out, new_version, schema, role="delta")
    if obs is not None:
        has_new = bool(obs.get.get("has_new") or 0)

    n_conflicts = 0
    if has_new:
        # rare path: resolve NEW conflicts against current state, re-stage
        # the delta without the conflicting keys (extra jobs only here)
        staged = spark.read.schema(schema).parquet(
            *[f"{lake.root}/{f['path']}" for f in new_files]
        ) if new_files else spark.createDataFrame([], schema)
        if touched is None:
            touched = sorted({f["bucket"] for f in new_files})
        current = resolve(spark, lake, buckets=touched)
        live = current.filter(F.col(op_col) != OP_DELETE).select(*key_cols)
        order = _lww_order(seq_col, tiebreakers)
        batch_winner_op = staged.groupBy(*key_cols).agg(
            F.max_by(F.col(op_col), order).alias("_wop")
        )
        conflicts = (
            batch_winner_op.filter(F.col("_wop") == OP_NEW)
            .join(live, key_cols, "left_semi")
            .select(*key_cols)
            .persist()
        )
        n_conflicts = conflicts.count()
        if n_conflicts:
            errors = conflicts.select(
                *key_cols,
                F.lit("node_exists_in_new_mode").alias("reason"),
                F.lit("error").alias("severity"),
            )
            if error_sink is not None:
                error_sink(errors)
            clean = staged.join(conflicts, key_cols, "left_anti")
            new_files = lake.write_data_files(
                clean, new_version, schema, role="delta",
                dirname=f"v{new_version}_resolved",
            )
        conflicts.unpersist()

    n_appended = sum(f["rows"] for f in new_files)
    lineage = {}
    for f in new_files:
        b = str(f["bucket"])
        seq_stats = (f.get("stats") or {}).get("_seq") or {}
        cur = lineage.setdefault(
            b, {"min_seq": None, "max_seq": None, "rows": 0}
        )
        cur["rows"] += f["rows"]
        if seq_stats:
            cur["min_seq"] = (
                seq_stats["min"]
                if cur["min_seq"] is None
                else min(cur["min_seq"], seq_stats["min"])
            )
            cur["max_seq"] = (
                seq_stats["max"]
                if cur["max_seq"] is None
                else max(cur["max_seq"], seq_stats["max"])
            )

    snap = lake.snapshot()
    metrics = {"rows_appended": n_appended, "new_mode_conflicts": n_conflicts}
    version = lake.commit(
        new_files, snap["files"], operation="append-delta", batch_id=batch_id,
        metrics=metrics,
    )
    return {
        "version": version,
        "metrics": metrics,
        "noop": False,
        "errors": None,
        "lineage": lineage,
    }


def compact(
    spark: SparkSession,
    lake: LakeTable,
    drop_tombstones_below_seq: int | None = None,
    buckets: list[int] | None = None,
    min_delta_files: int | None = None,
) -> int:
    """Rewrite base ∪ deltas into per-key winners (new base), drop deltas.

    ``drop_tombstones_below_seq``: tombstones with _seq below this watermark
    (e.g. the ledger's per-partition low-water) are physically removed —
    safe once no event below the watermark can still arrive.

    Bucket-targeted compaction (the 100 TB shape — a full-table rewrite
    per cadence is O(table), exactly the cost MoR exists to avoid):

    - ``buckets``: compact only these hash buckets; every other bucket's
      files are CARRIED into the new snapshot untouched.
    - ``min_delta_files``: auto-select buckets holding at least this many
      delta files (driver-side manifest scan, no job).  ``1`` means
      "every delta-bearing bucket, nothing else" — the in-loop setting:
      a bucket no batch touched is never rewritten.

    Keys hash to exactly one bucket, so per-bucket resolution is complete
    for the keys it covers.  With a restriction, GC is opportunistic: a
    dead tombstone in a SKIPPED bucket's base survives until that bucket
    next compacts (space amplification only — reads filter tombstones).
    Both None (default): full rewrite, tombstone GC everywhere.
    """
    schema = lake.schema()
    if min_delta_files is not None and buckets is None:
        per_bucket: dict[int, int] = {}
        for f in lake.delta_files():
            per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
        buckets = sorted(
            b for b, n in per_bucket.items() if n >= min_delta_files
        )
        if not buckets:
            return lake.latest_version()  # nothing ripe: no-op
    # bucket_partition=True: resolve hash-partitions its INPUT by _bucket
    # and groups on (_bucket, keys), so the output is already laid out one
    # bucket per partition — no second payload shuffle before the write
    # (plan: 2 Exchange -> 1; see OPTIMIZATION_r06.md)
    winners = resolve(spark, lake, buckets=buckets, bucket_partition=True)
    if drop_tombstones_below_seq is not None:
        winners = winners.filter(
            (F.col("_op") != OP_DELETE)
            | (F.col("_seq") >= drop_tombstones_below_seq)
        )
    out = _align(winners, schema)
    new_version = lake.latest_version() + 1
    if buckets is None:
        carried: list[dict] = []
        n_compacted = len(lake.snapshot()["files"])
    else:
        bset = set(buckets)
        snap_files = lake.snapshot()["files"]
        carried = [f for f in snap_files if f["bucket"] not in bset]
        n_compacted = len(snap_files) - len(carried)
    new_files = lake.write_data_files(out, new_version, schema, role="base")
    return lake.commit(new_files, carried, operation="compact", metrics={
        "files_compacted": n_compacted,
    })
