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


# ---------------------------------------------------------------------------
# Schema-derived "model"/"about" indexes (es_loader.py:138-209)
# ---------------------------------------------------------------------------

PROP_ENUM = "Enum"  # icdc_schema.py:16

_MODEL_DOC_SCHEMAS = {
    "node": "type string, node string, node_name string, node_kw string",
    "property": (
        "type string, node string, node_name string, property string,"
        " property_name string, property_kw string,"
        " property_description string, property_required boolean,"
        " property_type string"
    ),
    "value": (
        "type string, node string, node_name string, property string,"
        " property_name string, property_description string,"
        " property_required boolean, property_type string,"
        " value string, value_kw string"
    ),
}


def model_index_docs(spark: SparkSession, model: Model, subtype: str) -> DataFrame:
    """UI-facing documents derived from the SCHEMA, not the data — the
    reference's ``get_model_data`` (es_loader.py:167-209): one doc per node
    ('node'), per non-relationship property ('property'), or per enum value
    ('value').  Relationship-based properties never reach ``Model.nodes``
    (parent pointers compile to edges), matching the reference's
    ``"@relation" in type`` skip.  Metadata-sized by construction — the
    driver materializes the dicts and Spark distributes the write."""
    if subtype not in _MODEL_DOC_SCHEMAS:
        raise ValueError(f"unknown model index subtype: {subtype}")
    rows = []
    for node_name in sorted(model.nodes):
        props = model.props_of(node_name)
        if subtype == "node":
            rows.append(
                {"type": "node", "node": node_name, "node_name": node_name,
                 "node_kw": node_name}
            )
            continue
        for prop_name in sorted(props):
            p = props[prop_name]
            ptype = PROP_ENUM if p.enum else p.type
            if subtype == "property":
                rows.append(
                    {
                        "type": "property", "node": node_name,
                        "node_name": node_name, "property": prop_name,
                        "property_name": prop_name, "property_kw": prop_name,
                        "property_description": "",
                        "property_required": bool(p.required),
                        "property_type": ptype,
                    }
                )
            elif subtype == "value" and p.enum:
                for value in sorted(p.enum):
                    rows.append(
                        {
                            "type": "value", "node": node_name,
                            "node_name": node_name, "property": prop_name,
                            "property_name": prop_name,
                            "property_description": "",
                            "property_required": bool(p.required),
                            "property_type": PROP_ENUM,
                            "value": str(value), "value_kw": str(value),
                        }
                    )
    return spark.createDataFrame(rows, _MODEL_DOC_SCHEMAS[subtype])


def export_model_index(
    spark: SparkSession,
    model: Model,
    out_dir: str,
    subtype: str,
    bulk_format: bool = True,
    index_name: str = "model",
) -> int:
    """``load_model`` (es_loader.py:160-166): write the schema-derived docs
    in the same ``_bulk`` NDJSON wire shape as the data indexes."""
    df = model_index_docs(spark, model, subtype).coalesce(1)
    n = df.count()  # metadata-sized (driver-built rows): no re-read needed
    if bulk_format:
        action = F.to_json(
            F.struct(F.struct(F.lit(index_name).alias("_index")).alias("index"))
        )
        doc = F.to_json(F.struct(*df.columns))
        df.select(F.concat(action, F.lit("\n"), doc).alias("value")).write.mode(
            "overwrite"
        ).text(out_dir)
    else:
        df.write.mode("overwrite").json(out_dir)
    return n


def about_page_docs(spark: SparkSession, about_file: str) -> DataFrame:
    """``load_about_page`` (es_loader.py:138-148): one document per page of
    the about-YAML, id ``page{page}``; page payloads ride as raw JSON."""
    import json

    import yaml

    with open(about_file) as fh:
        pages = yaml.safe_load(fh)
    rows = [
        {"_id": f"page{p['page']}", "page": str(p["page"]),
         "doc": json.dumps(p, sort_keys=True)}
        for p in pages
    ]
    return spark.createDataFrame(rows, "_id string, page string, doc string")
