"""Model-driven TSV source + node preparation (the reference's input path).

Mirrors, set-oriented, the reference's per-row ``prepare_node``
(data_loader.py:375-489) over ``csv.DictReader`` TSV files
(data_loader.py:884-906):

- S1/S3: ``spark.read.csv(sep='\\t', header=True)`` over ``*.txt``/``*.tsv``
  globs; all columns read as strings (typing applied from the model).
- S2: encoding sniff — try utf-8, fall back windows-1252
  (check_encoding, data_loader.py:116-125) — driver-side on a prefix.
- P1: trim keys and values (cleanup_node, data_loader.py:375-377).
- P2: model-typed coercion (functions/coerce.py).
- P3: parent-id denormalization when the node type is in props
  ``save_parent_id``: ``parent.field`` copied to ``field``, or
  ``parent_field`` when the name clashes (data_loader.py:438-459; pinned by
  reference tests/test_loader.py:71-75).
- P4: value-with-unit companion props with the default unit
  (data_loader.py:460-462, icdc_schema.py:363-392).
- P5: UUIDv5 synthesis when no ``uuid`` column: from the id value, or from
  the full sorted signature when the type has no id
  (data_loader.py:464-474,491-497).
- P6: node projection drops parent pointers / relationship-prop columns.
"""

from __future__ import annotations

import codecs
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.identity import is_parent_pointer, make_uuid5_udf, signature_expr
from ..model import Model

NODE_TYPE_COL = "type"  # data_loader.py:27


def sniff_encoding(path: str, probe_bytes: int = 1 << 20) -> str:
    """S2 (data_loader.py:116-125): utf-8 unless the prefix fails to decode."""
    with open(path, "rb") as fh:
        chunk = fh.read(probe_bytes)
    try:
        codecs.decode(chunk, "utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def read_tsv(spark: SparkSession, paths: list[str] | str, encoding: str | None = None) -> DataFrame:
    """S1: header'd TSV, every column a string, row order tracked via an
    input line id (the reference reports 1-based line numbers where line 1
    is the header => data starts at 2, data_loader.py:654)."""
    first = paths[0] if isinstance(paths, list) else paths
    enc = encoding or (sniff_encoding(first) if os.path.exists(first) else "utf-8")
    if enc == "windows-1252":
        # Spark 4 restricts CSV charsets unless legacy java charsets are on
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("encoding", enc)
        .option("inferSchema", False)
        .csv(paths)
    )
    return df


def classify_columns(columns: list[str], model: Model) -> dict:
    """Split a TSV header into node props / parent pointers / rel props."""
    parent_pointers, rel_props, node_props = [], [], []
    for c in columns:
        cc = c.strip()
        if is_parent_pointer(cc):
            parent_pointers.append(c)
        elif model.is_relationship_property(cc):
            rel_props.append(c)
        else:
            node_props.append(c)
    return {
        "parent_pointers": parent_pointers,
        "rel_props": rel_props,
        "node_props": node_props,
    }


def prepare_nodes(df: DataFrame, node_type: str, model: Model) -> DataFrame:
    """The vectorized prepare_node: trim -> coerce -> parent-id denorm ->
    unit companions -> uuid5.  One projection, no Python in the hot path
    except the uuid5 Arrow UDF."""
    # P1: trim keys and values
    trimmed = df.select(
        *[F.trim(F.col(f"`{c}`")).alias(c.strip()) for c in df.columns]
    )
    # empty strings from trim stay empty ('' != NULL — the reference keeps '')
    cols = classify_columns(trimmed.columns, model)
    props = model.props_of(node_type)

    out = trimmed
    # P2: coercion per model type (parent pointers / rel props keep their
    # declared type from the PARENT / relationship — reference looks up
    # get_prop_type on the split name, data_loader.py:390-397)
    for c in cols["node_props"]:
        if c == NODE_TYPE_COL:
            continue
        if c in props:
            out = out.withColumn(c, model.coercion_expr(node_type, c))

    # P3: parent-id denormalization (only when configured in save_parent_id)
    if node_type in model.save_parent_id:
        for pp in cols["parent_pointers"]:
            parent, field = pp.strip().split(".", 1)
            target = f"{parent}_{field}" if field in trimmed.columns else field
            out = out.withColumn(target, F.col(f"`{pp}`"))

    # P4: value-with-unit companions (default unit; original = value)
    for name, p in props.items():
        if p.has_unit and name in trimmed.columns:
            out = (
                out.withColumn(name + "_unit", F.lit(p.default_unit))
                .withColumn(name + "_original", F.col(name))
                .withColumn(name + "_original_unit", F.lit(p.default_unit))
            )

    # P5: uuid5 synthesis (skip when a uuid column exists — passthrough,
    # data_loader.py:464 / reference tests/test_loader.py:67-68)
    if "uuid" not in out.columns:
        id_field = model.id_field(node_type)
        uuid_udf = make_uuid5_udf(model.domain)
        # reference get_signature excludes ONLY parent pointers
        # (data_loader.py:491-497); relationship-prop columns are included
        sig_cols = [c for c in out.columns if not is_parent_pointer(c)]
        signature = signature_expr(sig_cols)
        if id_field in out.columns:
            id_or_sig = F.when(
                F.col(id_field).isNotNull() & (F.col(id_field).cast("string") != ""),
                F.col(id_field).cast("string"),
            ).otherwise(signature)
        else:
            id_or_sig = signature
        out = out.withColumn(
            "uuid", uuid_udf(F.lit(node_type), id_or_sig)
        )
    return out


def node_projection(df: DataFrame, model: Model) -> DataFrame:
    """P6: drop parent pointers and relationship-prop columns."""
    drop = [
        c
        for c in df.columns
        if is_parent_pointer(c) or model.is_relationship_property(c)
    ]
    return df.drop(*drop)


def public_projection(df: DataFrame, node_type: str, model: Model) -> DataFrame:
    """P7: drop Private: true props (icdc_schema.py:652-660)."""
    return df.drop(*[p for p in model.private_props(node_type) if p in df.columns])


def extract_edges(
    df: DataFrame, node_type: str, model: Model, delimiter: str | None = None
) -> DataFrame:
    """Parent pointers -> edge rows (J2 staging; data_loader.py:965-1029).

    Output: (child_uuid, rel_type, parent_type, parent_id_field, parent_id,
    rel_props map).  Multi-valued pointers explode to one edge per value.
    """
    delimiter = delimiter or model.delimiter
    cols = classify_columns(df.columns, model)
    spark = df.sparkSession
    parts = []
    for pp in cols["parent_pointers"]:
        parent, field = pp.strip().split(".", 1)
        relinfo = model.relationship_for(node_type, parent)
        rel_name = relinfo[0] if relinfo else None
        rel_prop_cols = [
            c
            for c in cols["rel_props"]
            if rel_name and c.strip().split(model.rel_prop_delimiter, 1)[0] == rel_name
        ]
        rel_props = (
            F.create_map(
                *[
                    x
                    for c in rel_prop_cols
                    for x in (
                        F.lit(c.strip().split(model.rel_prop_delimiter, 1)[1]),
                        F.col(f"`{c}`").cast("string"),
                    )
                ]
            )
            if rel_prop_cols
            else F.create_map()
        )
        values = F.filter(
            F.transform(
                F.split(F.col(f"`{pp}`").cast("string"), "[" + delimiter + "]"),
                lambda x: F.trim(x),
            ),
            lambda x: x != "",
        )
        # _file_ord (when staged by GraphLoader): which input file the edge
        # came from — later files re-parent earlier ones deterministically
        file_ord = (
            F.col("_file_ord") if "_file_ord" in df.columns else F.lit(0)
        )
        parts.append(
            df.filter(F.col(f"`{pp}`").isNotNull())
            .select(
                F.col("uuid").alias("child_uuid"),
                F.lit(rel_name).alias("rel_type"),
                F.lit(parent).alias("parent_type"),
                F.lit(field).alias("parent_id_field"),
                F.explode(values).alias("parent_id"),
                rel_props.alias("rel_props"),
                file_ord.cast("int").alias("_file_ord"),
            )
        )
    if not parts:
        return spark.createDataFrame(
            [],
            "child_uuid string, rel_type string, parent_type string,"
            " parent_id_field string, parent_id string,"
            " rel_props map<string,string>, _file_ord int",
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
