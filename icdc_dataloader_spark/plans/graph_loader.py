"""Graph load orchestration: the reference's full load cycle, set-oriented.

Mirrors ``DataLoader.load`` / ``_load_all`` (data_loader.py:267-372):

1. validate every file (validation errors abort that file's load — the
   reference aborts the whole run; we quarantine per file and report);
2. load NODES for all files first, then RELATIONSHIPS for all files, so
   parents from any file exist before edges resolve
   (data_loader.py:365-372 — the stage barrier);
3. relationship pass: resolve parent pointers (J2), enforce multiplicity
   (J3/J4), upsert edges (J5); missing parents are reported (the
   MISSING_PARENT plugin event, data_loader.py:988-1001);
4. per-type created/updated counters (W6, data_loader.py:341-363).

Nodes live in one LakeTable per node type (keyed by the model id field);
edges in one edge table keyed (child_uuid, rel_type[, parent_uuid]).
Delete mode validates targets exist (V7) then cascades (J6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import Model
from ..operators.cascade import cascade_delete_keys
from ..operators.relationships import merge_edges, one_to_one_conflicts
from ..sources import tsv
from .lake import LakeTable
from .merge import merge_into, read_state, table_schema


class GraphLoader:
    def __init__(self, spark: SparkSession, root: str, model: Model, registry=None):
        self.spark = spark
        self.root = root
        self.model = model
        self.registry = registry  # plugins.PluginRegistry | None (§2.10)
        self._node_lakes: dict[str, LakeTable] = {}
        self._edge_lake: LakeTable | None = None
        self._seq = 0

    # -- table plumbing -------------------------------------------------------

    def node_lake(self, node_type: str, payload: T.StructType) -> LakeTable:
        if node_type not in self._node_lakes:
            self._node_lakes[node_type] = LakeTable.create(
                os.path.join(self.root, f"nodes_{node_type}"),
                table_schema(payload),
                key_cols=["uuid"],
                n_buckets=4,
            )
        return self._node_lakes[node_type]

    def edge_lake(self) -> LakeTable:
        if self._edge_lake is None:
            payload = T.StructType(
                [
                    T.StructField("child_uuid", T.StringType()),
                    T.StructField("rel_type", T.StringType()),
                    T.StructField("parent_type", T.StringType()),
                    T.StructField("parent_uuid", T.StringType()),
                    T.StructField(
                        "rel_props", T.MapType(T.StringType(), T.StringType())
                    ),
                ]
            )
            self._edge_lake = LakeTable.create(
                os.path.join(self.root, "edges"),
                table_schema(payload),
                key_cols=["child_uuid", "rel_type"],
                n_buckets=4,
            )
        return self._edge_lake

    def nodes(self, node_type: str) -> DataFrame:
        return read_state(self.spark, self._node_lakes[node_type])

    def _evolve_for(self, lake: LakeTable, df: DataFrame) -> None:
        """Add any new columns the derived rows carry (no rewrite)."""
        cur = lake.schema()
        have = {f.name for f in cur.fields}
        new_fields = [f for f in df.schema.fields if f.name not in have]
        if new_fields:
            evolved = T.StructType(list(cur.fields) + new_fields)
            lake.evolve_schema(evolved)

    def edges(self) -> DataFrame:
        return read_state(self.spark, self.edge_lake())

    # -- load ------------------------------------------------------------------

    def _next_seq(self) -> int:
        self._seq += 1
        return self._seq

    def load_files(
        self, files: list[tuple[str, str]], mode: str = "upsert"
    ) -> dict:
        """files: [(node_type, tsv_path)].  Nodes for ALL files first, then
        relationships (the reference's stage barrier, data_loader.py:365-372).
        Returns per-type metrics + missing-parent / conflict reports.
        """
        prepared: list[tuple[str, DataFrame]] = []
        for node_type, path in files:
            raw = tsv.read_tsv(self.spark, path)
            prep = tsv.prepare_nodes(raw, node_type, self.model).persist()
            prepared.append((node_type, prep))

        metrics: dict = {}
        # stage 1: nodes
        for node_type, prep in prepared:
            node_df = tsv.node_projection(prep, self.model).drop("type")
            payload = node_df.schema
            lake = self.node_lake(node_type, payload)
            seq = self._next_seq()
            staged = node_df.withColumn("_seq", F.lit(seq)).withColumn(
                "_op", F.lit(mode if mode != "delete" else "upsert")
            )
            res = merge_into(
                self.spark, lake, staged, batch_id=f"{node_type}-{seq}"
            )
            m = metrics.setdefault(node_type, {"created": 0, "updated": 0})
            m["created"] += res["metrics"].get("rows_inserted", 0)
            m["updated"] += res["metrics"].get("rows_updated", 0)

        # stage 2: relationships (parents from any file now exist)
        missing_total = 0
        conflicts_total = 0
        rels_created = 0
        for node_type, prep in prepared:
            staged_edges, missing = self._resolve_edges(node_type, prep)
            if staged_edges is None:
                continue
            missing_total += missing
            conflicts = one_to_one_conflicts(
                staged_edges.select(
                    F.col("child_uuid").alias("child_id"),
                    "rel_type",
                    F.col("parent_uuid").alias("parent_id"),
                )
            ).count()
            conflicts_total += conflicts
            seq = self._next_seq()
            lake = self.edge_lake()
            staged = staged_edges.withColumn("_seq", F.lit(seq)).withColumn(
                "_op", F.lit("upsert")
            )
            res = merge_into(self.spark, lake, staged, batch_id=f"edges-{node_type}-{seq}")
            rels_created += res["metrics"].get("rows_inserted", 0)
        for _, prep in prepared:
            prep.unpersist()
        metrics["relationships_created"] = rels_created
        metrics["missing_parents"] = missing_total
        metrics["one_to_one_conflicts"] = conflicts_total
        return metrics

    def _resolve_edges(self, node_type: str, prep: DataFrame):
        """J2: parent pointers -> (child_uuid, rel, parent_uuid) via the
        parent's id field; missing parents counted (warn, skip —
        data_loader.py:1006-1013)."""
        raw_edges = tsv.extract_edges(prep, node_type, self.model)
        if raw_edges.isEmpty():
            return None, 0
        parts = []
        missing = 0
        for parent_type in [
            r["parent_type"] for r in raw_edges.select("parent_type").distinct().collect()
        ]:
            if parent_type not in self._node_lakes:
                missing += raw_edges.filter(
                    F.col("parent_type") == parent_type
                ).count()
                continue
            id_field = self.model.id_field(parent_type)
            parents = self.nodes(parent_type).select(
                F.col(id_field).cast("string").alias("parent_id"),
                F.col("uuid").alias("parent_uuid"),
            )
            subset = raw_edges.filter(F.col("parent_type") == parent_type)
            resolved = subset.join(F.broadcast(parents), "parent_id", "left")

            # MISSING_PARENT plugin event (data_loader.py:988-1001): a
            # registered derivation stage may synthesize the missing parents
            # (VisitCreator analogue) — merge them, then re-resolve once.
            if self.registry is not None:
                from ..plugins import EVENT_MISSING_PARENT

                missing_df = resolved.filter(F.col("parent_uuid").isNull()).select(
                    "child_uuid", "parent_id"
                )
                derivations = self.registry.run(
                    self.spark, EVENT_MISSING_PARENT, parent_type, missing_df
                )
                for plugin, derived in derivations:
                    lake = self.node_lake(parent_type, derived.schema)
                    self._evolve_for(lake, derived)
                    seq = self._next_seq()
                    staged = derived.withColumn("_seq", F.lit(seq)).withColumn(
                        "_op", F.lit("upsert")
                    )
                    res = merge_into(
                        self.spark, lake, staged,
                        batch_id=f"plugin-{parent_type}-{seq}",
                    )
                    plugin.nodes_created = getattr(plugin, "nodes_created", 0) + res[
                        "metrics"
                    ].get("rows_inserted", 0)
                if derivations:
                    parents = self.nodes(parent_type).select(
                        F.col(id_field).cast("string").alias("parent_id"),
                        F.col("uuid").alias("parent_uuid"),
                    )
                    resolved = subset.join(F.broadcast(parents), "parent_id", "left")

            missing += resolved.filter(F.col("parent_uuid").isNull()).count()
            parts.append(
                resolved.filter(F.col("parent_uuid").isNotNull()).select(
                    "child_uuid", "rel_type", "parent_type", "parent_uuid", "rel_props"
                )
            )
        if not parts:
            return None, missing
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out, missing

    # -- delete ----------------------------------------------------------------

    def delete_cascade(self, node_type: str, id_values: list[str]) -> tuple[int, int]:
        """W3 + J6: delete seed nodes and all exclusively-owned descendants.

        Edge direction: child points at parent; deleting a node deletes
        children reachable from it that have no surviving parent
        (data_loader.py:826-870).  Returns (nodes_deleted, rels_deleted).
        """
        id_field = self.model.id_field(node_type)
        seeds = (
            self.nodes(node_type)
            .filter(F.col(id_field).cast("string").isin([str(v) for v in id_values]))
            .select(F.col("uuid").alias("node_id"))
        )
        edge_pairs = self.edges().select(
            F.col("child_uuid").alias("child_id"),
            F.col("parent_uuid").alias("parent_id"),
        )
        doomed = cascade_delete_keys(edge_pairs, seeds).persist()
        n_nodes = doomed.count()

        # drop doomed nodes from every node table
        seq = self._next_seq()
        for nt, lake in self._node_lakes.items():
            victims = (
                read_state(self.spark, lake)
                .join(
                    doomed.withColumnRenamed("node_id", "uuid"), "uuid", "left_semi"
                )
                .select("uuid")
                .withColumn("_seq", F.lit(seq))
                .withColumn("_op", F.lit("delete"))
            )
            if not victims.isEmpty():
                merge_into(self.spark, lake, victims, batch_id=f"del-{nt}-{seq}")

        # drop edges touching doomed nodes
        edges_now = read_state(self.spark, self.edge_lake())
        doomed_c = doomed.withColumnRenamed("node_id", "child_uuid")
        doomed_p = doomed.withColumnRenamed("node_id", "parent_uuid")
        dead_edges = (
            edges_now.join(doomed_c, "child_uuid", "left_semi")
            .unionByName(edges_now.join(doomed_p, "parent_uuid", "left_semi"))
            .select("child_uuid", "rel_type")
            .distinct()
        )
        n_rels = dead_edges.count()
        if n_rels:
            staged = dead_edges.withColumn("_seq", F.lit(seq)).withColumn(
                "_op", F.lit("delete")
            )
            merge_into(self.spark, self.edge_lake(), staged, batch_id=f"del-edges-{seq}")
        doomed.unpersist()
        return n_nodes, n_rels
