"""Streaming front-end for the lake's incremental change feed.

`plans/merge.changes_between` is the batch consume-side API (Iceberg
incremental-read analogue).  This module lets a consumer TAIL the feed:

1. :class:`ChangeFeedConsumer` — a checkpointed cursor + poll loop over
   the native DataFrame path.  This is the 100 TB shape: each poll is one
   `changes_between` call (manifest-diff bucket pruning, JVM-side LWW
   resolve), and the cursor advances only on consumer commit
   (at-least-once delivery; consumers are expected to be idempotent by
   version range — the same contract the write side keeps per batch_id).

2. :class:`LakeChangeFeedDataSource` — a Spark 4 Python streaming data
   source (``spark.readStream.format("lake_change_feed")``) so the feed
   composes with Structured Streaming checkpoints/sinks.  Offsets are
   lake VERSIONS; each micro-batch's input partitions are the CHANGED
   BUCKETS of (start, end] (driver-side manifest diff — untouched buckets
   are never opened), and each partition resolves its bucket's old/new
   winners and diffs them with pandas/Arrow inside the worker.  Keys hash
   to exactly one bucket, so the per-bucket diff is complete and the
   union over partitions equals ``changes_between`` row-for-row (pinned
   by tests/test_change_feed_stream.py).

Reference analogue: consumers of the loader's graph reading what a load
changed (the visit/relationship audit stats the loader prints,
data_loader.py load metrics) — here as a first-class resumable stream.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..plans.lake import LakeTable
from ..plans.merge import INTERNAL_COLS, changed_buckets, changes_between

OP_DELETE = "delete"


# ---------------------------------------------------------------------------
# 1. Driver-side cursor consumer (the scale path)
# ---------------------------------------------------------------------------


class ChangeFeedConsumer:
    """Checkpointed incremental consumer of a lake table's change feed.

    ``poll()`` returns the feed DataFrame spanning (cursor, latest] plus
    the version range; the caller processes it durably, then calls
    ``commit(v_to)``.  A crash between poll and commit re-delivers the
    same range — at-least-once, idempotent by (v_from, v_to].
    """

    def __init__(self, lake: LakeTable, checkpoint_dir: str,
                 start_version: int | None = None):
        self.lake = lake
        self.root = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.path = os.path.join(checkpoint_dir, "cursor.json")
        if not os.path.exists(self.path):
            v0 = (lake.latest_version() if start_version is None
                  else start_version)
            self._write(v0)

    def position(self) -> int:
        with open(self.path) as fh:
            return json.load(fh)["version"]

    def _write(self, version: int) -> None:
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump({"version": int(version)}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self.path)

    def poll(self, spark: SparkSession) -> dict | None:
        """Next unconsumed increment, or None when caught up."""
        v_from = self.position()
        v_to = self.lake.latest_version()
        if v_to is None or v_to <= v_from:
            return None
        return {
            "v_from": v_from,
            "v_to": v_to,
            "df": changes_between(spark, self.lake, v_from, v_to),
        }

    def commit(self, v_to: int) -> None:
        """Durably advance the cursor — call AFTER processing the poll."""
        if v_to > self.position():
            self._write(v_to)


# ---------------------------------------------------------------------------
# 2. Structured Streaming source (spark.readStream.format("lake_change_feed"))
# ---------------------------------------------------------------------------


@dataclass
class _BucketDiffPartition(InputPartition):
    """One changed bucket's diff task (picklable; carries the file lists
    so workers never read manifests)."""

    bucket: int
    old_files: list = field(default_factory=list)  # [(abs_path, schema_json)]
    new_files: list = field(default_factory=list)
    key_cols: list = field(default_factory=list)
    tiebreakers: list = field(default_factory=list)
    payload_cols: list = field(default_factory=list)
    int_cols: list = field(default_factory=list)  # integral payload cols


def _load_aligned(files: list, cols: list[str]):
    """Concat the parquet files' ``cols`` into one pandas frame, filling
    columns absent from a file's schema with nulls (schema evolution)."""
    import pandas as pd
    import pyarrow.parquet as pq

    frames = []
    for path, schema_json in files:
        have = {f["name"] for f in json.loads(schema_json)["fields"]}
        want = [c for c in cols if c in have]
        pdf = pq.read_table(path, columns=want).to_pandas()
        for c in cols:
            if c not in pdf.columns:
                pdf[c] = None
        frames.append(pdf[cols])
    if not frames:
        return pd.DataFrame({c: [] for c in cols})
    return pd.concat(frames, ignore_index=True)


def _winners_chunked(files: list, cols: list[str], key_cols: list[str],
                     tiebreakers: list[str]):
    """Per-key LWW winners over the files' rows with BOUNDED memory: fold
    one row group at a time into a running winner frame instead of
    concatenating every file into pandas first (round-5 verdict: a hot
    bucket's full state landed in one Python worker).  Peak memory is
    O(live keys in bucket + one row group), not O(all rows incl.
    superseded).  The LWW order key is total (seq + tiebreakers), so the
    pairwise fold equals the global reduction; exact-duplicate ties keep
    the later chunk's row, matching the previous whole-frame stable sort
    (keep='last' over running-then-chunk concat order)."""
    import pandas as pd
    import pyarrow.parquet as pq

    running = None
    for path, schema_json in files:
        have = {f["name"] for f in json.loads(schema_json)["fields"]}
        want = [c for c in cols if c in have]
        pf = pq.ParquetFile(path)
        for rg in range(pf.metadata.num_row_groups):
            pdf = pf.read_row_group(rg, columns=want).to_pandas()
            for c in cols:
                if c not in pdf.columns:
                    pdf[c] = None
            pdf = pdf[cols]
            merged = (pdf if running is None
                      else pd.concat([running, pdf], ignore_index=True))
            running = _winners(merged, key_cols, tiebreakers)
    if running is None:
        return pd.DataFrame({c: [] for c in cols})
    return running


def _winners(pdf, key_cols: list[str], tiebreakers: list[str]):
    """Per-key LWW winner — the pandas mirror of the engine's total order
    (_seq, then each tiebreaker cast to string with NULL -> '').  Stable
    sort + drop_duplicates(keep='last'); NaN key components group
    together (pandas treats NaN as equal in duplicated/merge), matching
    the JVM side's eqNullSafe."""
    ord_cols = ["_seq"]
    pdf = pdf.copy()
    for i, tb in enumerate(tiebreakers):
        c = f"_ord{i}"
        pdf[c] = pdf[tb].astype("string").fillna("")
        ord_cols.append(c)
    pdf = pdf.sort_values(ord_cols, kind="mergesort")
    win = pdf.drop_duplicates(subset=key_cols, keep="last")
    return win.drop(columns=[c for c in win.columns if c.startswith("_ord")])


class LakeChangeFeedDataSource(DataSource):
    """``spark.readStream.format("lake_change_feed").option("path", root)``.

    Options:

    - ``path`` (required): LakeTable root directory.
    - ``startVersion`` (optional): feed starts AFTER this version
      (exclusive).  Default: the latest version at stream start (future
      changes only).

    Offsets are lake versions — monotone, replayable, and exactly the
    unit the write side commits — so Structured Streaming's checkpoint
    gives resume-where-you-left-off for free and a replayed epoch
    recomputes the identical (v_from, v_to] diff (snapshots are
    immutable until vacuum).
    """

    @classmethod
    def name(cls) -> str:
        return "lake_change_feed"

    def schema(self) -> T.StructType:
        return feed_schema(LakeTable(self.options["path"]))

    def streamReader(self, schema: T.StructType) -> "LakeChangeFeedReader":
        return LakeChangeFeedReader(self.options, schema)


def feed_schema(lake: LakeTable) -> T.StructType:
    """The feed's row schema at the lake's CURRENT version:
    key columns, change_type, then payload columns."""
    key_cols = lake.key_cols()
    fields = []
    by_name = {f.name: f for f in lake.schema().fields}
    for k in key_cols:
        fields.append(by_name[k])
    fields.append(T.StructField("change_type", T.StringType(), True))
    for f in lake.schema().fields:
        if f.name not in key_cols and f.name not in INTERNAL_COLS:
            fields.append(f)
    return T.StructType(fields)


class LakeChangeFeedReader(DataSourceStreamReader):
    def __init__(self, options, schema: T.StructType | None = None):
        self.root = options["path"]
        self.start = options.get("startVersion")
        self.lake = LakeTable(self.root)
        # The stream's row arity is FIXED at the schema declared when the
        # stream started; if the lake evolves mid-stream the new columns
        # must NOT appear in emitted rows (Spark kills the query with
        # DATA_SOURCE_RETURN_SCHEMA_MISMATCH otherwise).  Restart the
        # stream to pick up added columns — the same contract as file
        # sources.
        self.declared_schema = (
            schema if schema is not None else feed_schema(self.lake)
        )

    def initialOffset(self) -> dict:
        v = (int(self.start) if self.start is not None
             else (self.lake.latest_version() or 0))
        return {"version": v}

    def latestOffset(self) -> dict:
        return {"version": self.lake.latest_version() or 0}

    def partitions(self, start: dict, end: dict):
        v_from, v_to = start["version"], end["version"]
        if v_to <= v_from:
            return []
        lake = self.lake
        # same contract as changes_between: a stream that lagged past
        # vacuum retention must fail clearly, not crash on missing files
        # mid-read (best-effort at plan time, see ensure_retained)
        lake.ensure_retained(
            v_from,
            hint="Restart the stream with a fresh checkpoint after "
                 "re-bootstrapping from the table.",
        )
        key_cols = lake.key_cols()
        tiebreakers = lake.tiebreakers()
        # payload columns come from the schema declared at stream start,
        # NOT lake.schema(v_to): mid-stream evolution must not change the
        # emitted row arity (see __init__)
        payload_cols = [
            f.name for f in self.declared_schema.fields
            if f.name not in key_cols and f.name != "change_type"
        ]
        int_cols = [
            f.name for f in self.declared_schema.fields
            if f.name in payload_cols
            and isinstance(f.dataType, (T.ByteType, T.ShortType,
                                        T.IntegerType, T.LongType))
        ]
        old_by_bucket: dict[int, list] = {}
        new_by_bucket: dict[int, list] = {}
        for snap_v, acc in ((v_from, old_by_bucket), (v_to, new_by_bucket)):
            for f in lake.snapshot(snap_v)["files"]:
                acc.setdefault(f["bucket"], []).append(
                    (os.path.join(lake.root, f["path"]), f["schema"])
                )
        return [
            _BucketDiffPartition(
                bucket=b,
                old_files=old_by_bucket.get(b, []),
                new_files=new_by_bucket.get(b, []),
                key_cols=key_cols,
                tiebreakers=tiebreakers,
                payload_cols=payload_cols,
                int_cols=int_cols,
            )
            for b in changed_buckets(lake, v_from, v_to)
        ]

    # rows per emitted Arrow batch: large enough to amortize the
    # per-batch boundary cost, small enough to bound the serialized batch
    ARROW_BATCH_ROWS = 32_768

    def read(self, partition: _BucketDiffPartition):
        import pandas as pd
        import pyarrow as pa

        p = partition
        meta_cols = list(
            dict.fromkeys(list(p.key_cols) + ["_seq", "_op"] + p.tiebreakers)
        )
        # winners are folded one row group at a time (bounded memory; see
        # _winners_chunked) — the round-5 shape materialized the bucket's
        # ENTIRE old+new state in one pandas frame before reducing
        old = _winners_chunked(
            p.old_files, meta_cols, p.key_cols, p.tiebreakers
        )
        old = old[old["_op"] != OP_DELETE][p.key_cols + ["_seq"]].rename(
            columns={"_seq": "_old_seq"}
        )
        new_cols = list(
            dict.fromkeys(meta_cols + p.payload_cols)
        )
        new = _winners_chunked(
            p.new_files, new_cols, p.key_cols, p.tiebreakers
        )
        new = new[new["_op"] != OP_DELETE][
            p.key_cols + ["_seq"] + p.payload_cols
        ].rename(columns={"_seq": "_new_seq"})

        j = new.merge(old, on=p.key_cols, how="outer")  # NaN keys match
        ins = j["_old_seq"].isna() & j["_new_seq"].notna()
        dele = j["_new_seq"].isna() & j["_old_seq"].notna()
        upd = j["_new_seq"].notna() & j["_old_seq"].notna() & (
            j["_new_seq"] != j["_old_seq"]
        )
        j["change_type"] = None
        j.loc[ins, "change_type"] = "insert"
        j.loc[dele, "change_type"] = "delete"
        j.loc[upd, "change_type"] = "update"
        out = j[j["change_type"].notna()][
            p.key_cols + ["change_type"] + p.payload_cols
        ]
        out = out.astype(object).where(pd.notnull(out), None)
        for c in p.int_cols:
            # the outer merge float-ifies nullable int64 payload columns;
            # restore integral values for the declared LongType fields
            out[c] = out[c].map(lambda v: None if v is None else int(v))
        # emit pyarrow RecordBatches, not per-row Python tuples: the
        # datasource API ships Arrow batches to the JVM wholesale, while
        # tuple yield pays per-row pickling + per-row conversion (round-5
        # verdict item; measured in bench/feed_bench.py).  The batch
        # schema must match the declared source schema exactly.
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.declared_schema)
        for lo in range(0, len(out), self.ARROW_BATCH_ROWS):
            chunk = out.iloc[lo:lo + self.ARROW_BATCH_ROWS]
            yield pa.RecordBatch.from_pandas(
                chunk, schema=arrow_schema, preserve_index=False
            )

    def commit(self, end: dict) -> None:
        pass  # Structured Streaming's checkpoint owns the offset


def register_change_feed_source(spark: SparkSession) -> None:
    spark.dataSource.register(LakeChangeFeedDataSource)


def read_change_feed_stream(
    spark: SparkSession, lake_root: str, start_version: int | None = None
) -> DataFrame:
    """Convenience: register the source and open the streaming feed."""
    register_change_feed_source(spark)
    reader = spark.readStream.format("lake_change_feed").option(
        "path", lake_root
    )
    if start_version is not None:
        reader = reader.option("startVersion", str(start_version))
    return reader.load()
