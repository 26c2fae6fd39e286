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


class IndividualCreator:
    """J7 (individual_creator.py:38-69) + W8 sequence ids, set-oriented.

    Reference behavior, per registration node loaded (NODE_LOADED): if the
    registration connects MORE than one case, the cases must share one
    individual —

    - cases already linked to >1 distinct individuals -> error (the
      reference raises, individual_creator.py:50-56);
    - exactly 1 -> reuse it;
    - 0 -> create one with id ``format(max(toInteger(id))+1, '0000')``
      (W8, individual_creator.py:71-93) and
      ``uuid5(domain, individual_type, registration_id)``;
    - connect every case of the registration to the individual
      (individual_creator.py:95-110).

    Here the per-row Cypher probes become three joins over the edge lake,
    one pass for ALL registrations in the batch.  Returns the derivation
    dict {'nodes': {individual_type: df}, 'edges': df} consumed by
    GraphLoader._apply_derivation.
    """

    def __init__(
        self,
        registration_type: str = "registration",
        case_type: str = "case",
        individual_type: str = "individual",
        individual_id_field: str = "individual_id",
        domain: str = "example.org",
        on_conflict: str = "raise",
    ):
        self.registration_type = registration_type
        self.case_type = case_type
        self.individual_type = individual_type
        self.individual_id_field = individual_id_field
        self.domain = domain
        self.on_conflict = on_conflict
        self.events = {EVENT_NODE_LOADED}
        self.nodes_created = 0
        self.relationships_created = 0

    def should_run(self, node_type: str, event: str) -> bool:
        return node_type == self.registration_type and event == EVENT_NODE_LOADED

    def derive(self, spark, event, node_type, loaded_df, context):
        from .functions.identity import uuid5_expr
        from .plans.graph_loader import allocate_sequence_ids

        loader = context["loader"]
        edges = loader.edges()
        reg_id_field = loader.model.id_field(self.registration_type)

        regs = loaded_df.select(
            F.col("uuid").alias("reg_uuid"),
            F.col(reg_id_field).cast("string").alias("reg_id"),
        )
        # registration -> case links (multi-case detection,
        # individual_creator.py:38-44: WHERE size(cc) > 1)
        reg_case = (
            edges.filter(F.col("parent_type") == self.case_type)
            .select(
                F.col("child_uuid").alias("reg_uuid"),
                F.col("parent_uuid").alias("case_uuid"),
            )
            .join(regs, "reg_uuid")
        )
        multi = (
            reg_case.groupBy("reg_uuid", "reg_id")
            .agg(F.collect_set("case_uuid").alias("cases"))
            .filter(F.size("cases") > 1)
        )
        # existing individuals of those cases
        case_ind = edges.filter(
            F.col("parent_type") == self.individual_type
        ).select(
            F.col("child_uuid").alias("case_uuid"),
            F.col("parent_uuid").alias("ind_uuid"),
        )
        per_reg = (
            multi.select("reg_uuid", "reg_id", F.explode("cases").alias("case_uuid"))
            .join(case_ind, "case_uuid", "left")
            .groupBy("reg_uuid", "reg_id")
            .agg(
                F.collect_set("case_uuid").alias("cases"),
                F.collect_set("ind_uuid").alias("inds"),
            )
            .persist()
        )
        n_conflicts = per_reg.filter(F.size("inds") > 1).count()
        if n_conflicts and self.on_conflict == "raise":
            # reference: "More than one individuals associated with one
            # dog!" (individual_creator.py:53-56)
            per_reg.unpersist()
            raise RuntimeError(
                f"{n_conflicts} registration(s) whose cases span more than "
                "one individual"
            )
        reuse = per_reg.filter(F.size("inds") == 1).select(
            "reg_uuid", "cases", F.element_at("inds", 1).alias("ind_uuid")
        )
        need_new = per_reg.filter(F.size("inds") == 0)

        existing_max = 0
        if self.individual_type in loader._node_lakes:
            row = (
                loader.nodes(self.individual_type)
                .agg(F.max(F.col(self.individual_id_field).cast("int")).alias("m"))
                .collect()[0]
            )
            existing_max = int(row["m"] or 0)
        new_inds = allocate_sequence_ids(
            need_new.select("reg_uuid", "reg_id", "cases"),
            existing_max,
            self.individual_id_field,
            order_col="reg_id",
        ).withColumn(
            "uuid", uuid5_expr(self.domain, self.individual_type, F.col("reg_id"))
        )
        nodes = new_inds.select(self.individual_id_field, "uuid")

        edge_rows = (
            reuse.select("cases", "ind_uuid")
            .unionByName(
                new_inds.select("cases", F.col("uuid").alias("ind_uuid"))
            )
            .select(F.explode("cases").alias("child_uuid"), "ind_uuid")
            .select(
                "child_uuid",
                F.lit(self._rel_type(loader)).alias("rel_type"),
                F.lit(self.individual_type).alias("parent_type"),
                F.col("ind_uuid").alias("parent_uuid"),
            )
        )
        per_reg.unpersist()
        return {"nodes": {self.individual_type: nodes}, "edges": edge_rows}

    def _rel_type(self, loader) -> str:
        rel = loader.model.relationship_for(self.case_type, self.individual_type)
        return rel[0] if rel else "of_individual"


class VisitCreator:
    """Full VisitCreator (W7): synthesize the inferred visit AND attach it
    to its cycle / fallback case edge (visit_creator.py:49-173).

    On MISSING_PARENT of a visit: the missing parent ids are the visit ids;
    the visit date and case come from the CHILD rows (the reference reads
    ``src[date_map[source_type]]`` and ``src[CASE_ID]``,
    visit_creator.py:62-67,95-99).  Set-oriented composition:

    1. nodes: distinct (visit_id, visit_date, case_id, inferred=true,
       uuid5(domain, visit_type, visit_id));
    2. edges: interval-join each visit to its containing cycle
       (J8 — first cycle by start date wins; <= ``predate`` days before the
       first cycle attaches to it; open end = forever); matched ->
       (visit)-[of_cycle {inferred: true}]->(cycle), unmatched ->
       (visit)-[of_case]->(case) (visit_creator.py:166-173, 182-200).
    """

    def __init__(
        self,
        visit_type: str = "visit",
        visit_id_field: str = "visit_id",
        date_col: str = "visit_date",
        case_col: str = "case_id",
        case_type: str = "case",
        cycle_type: str = "cycle",
        cycle_start: str = "date_of_cycle_start",
        cycle_end: str = "date_of_cycle_end",
        domain: str = "example.org",
        predate_days: int = 7,  # PREDATE, visit_creator.py:19
    ):
        self.visit_type = visit_type
        self.visit_id_field = visit_id_field
        self.date_col = date_col
        self.case_col = case_col
        self.case_type = case_type
        self.cycle_type = cycle_type
        self.cycle_start = cycle_start
        self.cycle_end = cycle_end
        self.domain = domain
        self.predate_days = predate_days
        self.events = {EVENT_MISSING_PARENT}
        self.nodes_created = 0
        self.relationships_created = 0

    def should_run(self, node_type: str, event: str) -> bool:
        return node_type == self.visit_type and event == EVENT_MISSING_PARENT

    def derive(self, spark, event, node_type, missing_df, context):
        from .functions.identity import uuid5_expr
        from .operators.relationships import interval_join_visits_to_cycles

        loader = context["loader"]
        children = context["children"]
        child_type = context["child_type"]
        child_id_field = loader.model.id_field(child_type)
        pointer = f"{self.visit_type}.{self.visit_id_field}"

        # visit id + date + case from the child rows that pointed at it
        visits = (
            missing_df.join(
                children.select(
                    F.col("uuid").alias("child_uuid"),
                    F.col(self.date_col).alias("visit_date"),
                    F.col(self.case_col).cast("string").alias("case_id"),
                ),
                "child_uuid",
            )
            .select(
                F.col("parent_id").alias(self.visit_id_field),
                "visit_date",
                "case_id",
            )
            .distinct()
        )
        nodes = (
            visits.withColumn("inferred", F.lit(True))
            .withColumn(
                "uuid",
                uuid5_expr(
                    self.domain, self.visit_type, F.col(self.visit_id_field)
                ),
            )
        )

        # cycle attach (J8).  No cycles table yet -> everything falls back.
        if self.cycle_type in loader._node_lakes:
            cycles = loader.nodes(self.cycle_type).select(
                F.col("case_id").cast("string").alias("case_id"),
                F.col("uuid").alias("cycle_uuid"),
                F.col(self.cycle_start).alias("start_date"),
                F.col(self.cycle_end).alias("end_date"),
            )
            # the interval join emits the matched cycle as 'cycle_id'
            assigned = interval_join_visits_to_cycles(
                nodes.select("uuid", "case_id", "visit_date"),
                cycles,
                case_col="case_id",
                visit_date="visit_date",
                cycle_start="start_date",
                cycle_end="end_date",
                cycle_id="cycle_uuid",
                predate_days=self.predate_days,
            ).withColumnRenamed("cycle_id", "_cycle")
        else:
            assigned = nodes.select("uuid", "case_id").withColumn(
                "_cycle", F.lit(None).cast("string")
            )

        of_cycle = self._rel(loader, self.cycle_type, "of_cycle")
        of_case = self._rel(loader, self.case_type, "of_case")
        case_uuids = loader.nodes(self.case_type).select(
            F.col(loader.model.id_field(self.case_type)).cast("string").alias(
                "case_id"
            ),
            F.col("uuid").alias("case_uuid"),
        ) if self.case_type in loader._node_lakes else None

        matched = assigned.filter(F.col("_cycle").isNotNull()).select(
            F.col("uuid").alias("child_uuid"),
            F.lit(of_cycle).alias("rel_type"),
            F.lit(self.cycle_type).alias("parent_type"),
            F.col("_cycle").alias("parent_uuid"),
            # the reference marks the inferred attachment on the edge
            # (MERGE ... { inferred: true }, visit_creator.py:152)
            F.create_map(F.lit("inferred"), F.lit("true")).alias("rel_props"),
        )
        edges = matched
        if case_uuids is not None:
            fallback = (
                assigned.filter(F.col("_cycle").isNull())
                .join(case_uuids, "case_id")
                .select(
                    F.col("uuid").alias("child_uuid"),
                    F.lit(of_case).alias("rel_type"),
                    F.lit(self.case_type).alias("parent_type"),
                    F.col("case_uuid").alias("parent_uuid"),
                    F.create_map(F.lit("inferred"), F.lit("true")).alias(
                        "rel_props"
                    ),
                )
            )
            edges = matched.unionByName(fallback)
        return {"nodes": {self.visit_type: nodes}, "edges": edges}

    def _rel(self, loader, dst_type: str, default: str) -> str:
        rel = loader.model.relationship_for(self.visit_type, dst_type)
        return rel[0] if rel else default


class InferredParentCreator:
    """Generic MISSING_PARENT synthesizer (visit_creator.py:49-97 semantics
    without the cycle attach — see :class:`VisitCreator` for the full
    composition): synthesize missing parent nodes with ``inferred=true``
    and a deterministic uuid5, so the relationship pass can attach children
    instead of dropping edges.

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
