"""Derivation-stage plugin registry (SURVEY §2.10).

The reference's loader plugins are duck-typed classes with ``should_run``
and ``create_node`` invoked on MISSING_PARENT / NODE_LOADED events
(data_loader.py:153-167,988-1001,1158-1161; loaded dynamically via
``load_plugin(module, class, params)``, loader.py:200-204).  Examples:
VisitCreator synthesizes inferred visit nodes for missing visit parents
(visit_creator.py:49-97) and IndividualCreator links multi-case
registrations (individual_creator.py:38-69).

Here a plugin is a duck-typed DERIVATION STAGE: instead of creating one
node per callback row, it receives a DataFrame of event rows and returns a
DataFrame of synthesized rows — set-oriented, invoked once per batch.

Contract (duck-typed, enforced like data_loader.py:153-167):

- ``events`` (attr): set of event names it subscribes to
- ``should_run(node_type, event) -> bool``
- ``derive(spark, event, node_type, df, context) -> DataFrame | None``
  (rows to merge into the node table for ``node_type``)
"""

from __future__ import annotations

import importlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_MISSING_PARENT = "missing_parent"  # data_loader.py MISSING_PARENT
EVENT_NODE_LOADED = "node_loaded"        # data_loader.py NODE_LOADED

_REQUIRED_ATTRS = ("events", "should_run", "derive")


class PluginRegistry:
    def __init__(self):
        self._plugins: list = []

    def register(self, plugin) -> None:
        missing = [a for a in _REQUIRED_ATTRS if not hasattr(plugin, a)]
        if missing:
            raise TypeError(
                f"plugin {type(plugin).__name__} missing attrs: {missing}"
            )
        self._plugins.append(plugin)

    def load_plugin(self, module: str, class_name: str, params: dict | None = None):
        """Dynamic import, the reference's load_plugin (loader.py:200-204)."""
        cls = getattr(importlib.import_module(module), class_name)
        plugin = cls(**(params or {}))
        self.register(plugin)
        return plugin

    def run(
        self,
        spark: SparkSession,
        event: str,
        node_type: str,
        df: DataFrame,
        context: dict | None = None,
    ) -> list[tuple[object, DataFrame]]:
        """Invoke every subscribed plugin; returns [(plugin, derived_rows)]."""
        out = []
        for p in self._plugins:
            if event in p.events and p.should_run(node_type, event):
                derived = p.derive(spark, event, node_type, df, context or {})
                if derived is not None:
                    out.append((p, derived))
        return out


class InferredParentCreator:
    """VisitCreator analogue (visit_creator.py:49-97): synthesize missing
    parent nodes with ``inferred=true`` and a deterministic uuid5, so the
    relationship pass can attach children instead of dropping edges.

    ``derive`` receives the missing-edges DataFrame
    (child_id/parent_id shape from resolve_parents['missing']).
    """

    def __init__(self, parent_type: str, id_field: str, domain: str):
        self.parent_type = parent_type
        self.id_field = id_field
        self.domain = domain
        self.events = {EVENT_MISSING_PARENT}
        self.nodes_created = 0  # stat attr, like visit_creator.py counters

    def should_run(self, node_type: str, event: str) -> bool:
        return node_type == self.parent_type and event == EVENT_MISSING_PARENT

    def derive(self, spark, event, node_type, missing_df, context):
        from .functions.identity import make_uuid5_udf

        uuid_udf = make_uuid5_udf(self.domain)
        rows = (
            missing_df.select(F.col("parent_id").alias(self.id_field))
            .distinct()
            .withColumn("inferred", F.lit(True))
            .withColumn(
                "uuid",
                uuid_udf(F.lit(self.parent_type), F.col(self.id_field)),
            )
        )
        return rows
