"""Read-side export: the es_loader analogue (reference es_loader.py).

The reference paginates Cypher queries (SKIP/LIMIT, es_loader.py:99-113)
and bulk-posts JSON documents to Elasticsearch (streaming_bulk,
es_loader.py:122-136).  Set-oriented: a projection over the resolved table
state written as JSON-lines part files — the shape any bulk indexer
ingests; pagination disappears because the scan is distributed.  Private
props are dropped from public exports (icdc_schema.py:652-660).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import Model
from .lake import LakeTable
from .merge import read_state


def export_index(
    spark: SparkSession,
    lake: LakeTable,
    out_dir: str,
    node_type: str | None = None,
    model: Model | None = None,
    select: list[str] | None = None,
    doc_id_col: str | None = None,
    partitions: int | None = None,
    bulk_format: bool = False,
    index_name: str = "nodes",
) -> int:
    """Write the current live state as JSON-lines 'bulk index' files.

    Returns the number of exported documents.  ``doc_id_col`` becomes the
    ``_id`` field (the ES bulk convention).  ``bulk_format=True`` emits the
    exact ``_bulk`` NDJSON wire shape — an action line
    ``{"index":{"_index":...,"_id":...}}`` followed by the source document
    — so the part files POST to an ES/OpenSearch ``_bulk`` endpoint as-is
    (the reference streams the same pairs via streaming_bulk,
    es_loader.py:122-136).
    """
    df = read_state(spark, lake)
    if model is not None and node_type is not None:
        private = [p for p in model.private_props(node_type) if p in df.columns]
        df = df.drop(*private)
    if select:
        df = df.select(*select)
    if doc_id_col and doc_id_col in df.columns:
        df = df.withColumn("_id", F.col(doc_id_col).cast("string"))
    if partitions:
        df = df.repartition(partitions)
    if bulk_format:
        doc_cols = [c for c in df.columns if c != "_id"]
        action_fields = [F.lit(index_name).alias("_index")]
        if "_id" in df.columns:
            action_fields.append(F.col("_id"))
        action = F.to_json(F.struct(F.struct(*action_fields).alias("index")))
        doc = F.to_json(F.struct(*doc_cols))
        df.select(
            F.concat(action, F.lit("\n"), doc).alias("value")
        ).write.mode("overwrite").text(out_dir)
        # count from the written files (2 lines per document) — a df.count()
        # here would recompute the whole resolve+projection a second time
        return spark.read.text(out_dir).count() // 2
    df.write.mode("overwrite").json(out_dir)
    return spark.read.json(out_dir).count()


def export_report(errors: DataFrame, out_dir: str) -> None:
    """Validation report export (the xlsx analogue, data_loader.py:243-253):
    grouped error relation as CSV part files."""
    (
        errors.write.mode("overwrite")
        .option("header", True)
        .csv(out_dir)
    )
