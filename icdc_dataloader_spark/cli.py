"""CLI batch load — the reference's flagship entry point (loader.py:31-240).

``python -m icdc_dataloader_spark [config.yml] --dataset DIR ...`` runs the
full cycle over a drop folder of TSV files:

1. discover ``*.txt``/``*.tsv`` files, detect each file's node type from
   its ``type`` column (data_loader.py reads the same column);
2. validate every file against the model (V1 header diff + V2/V3 value
   scans, violations capped per (property, reason) by ``max_violations``
   — V8) and write the grouped report as CSV under ``temp_folder``
   (the xlsx analogue); a file with severity=error violations is NOT
   loaded (reference aborts the whole run; per-file quarantine is the
   set-oriented softening, reported loudly);
3. unless ``--dry-run``: load nodes-then-relationships through
   GraphLoader (one staged merge commit per node type), firing configured
   plugins; DELETE_MODE cascades deletes of the listed ids (W3+J6);
4. ``--wipe-db`` first wipes every lake under ``graph_root`` (J10) —
   like delete mode it requires ``--yes`` (V10's confirm gate: this
   engine is non-interactive, the flag IS the confirmation).

The config file is the reference's own YAML shape (see config.py); CLI
flags mirror loader.py's and take precedence.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .config import (
    DELETE_MODE,
    MODE_TO_OP,
    NEW_MODE,
    UPSERT_MODE,
    LoaderConfig,
)
from .model import Model
from .operators.validate import (
    cap_violations,
    validate_header,
    validation_errors,
)
from .plans.export import export_report
from .plans.graph_loader import GraphLoader
from .plans.lake import LakeTable
from .plugins import PluginRegistry
from .sources import tsv


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Load TSV(TXT) files into a Spark lake graph"
    )
    p.add_argument("config_file", nargs="?", default=None,
                   help="YAML config (reference data-loader-config shape)")
    p.add_argument("-s", "--schema", action="append", help="Schema files")
    p.add_argument("--prop-file", help="Property file")
    p.add_argument("--dataset", help="Dataset directory")
    p.add_argument("--graph-root", help="Lake-graph directory (neo4j-uri analogue)")
    p.add_argument("-m", "--mode", choices=list(MODE_TO_OP),
                   help="Loading mode")
    p.add_argument("-c", "--cheat-mode", action="store_true",
                   help="Skip validations")
    p.add_argument("-d", "--dry-run", action="store_true",
                   help="Validations only, skip loading")
    p.add_argument("--wipe-db", action="store_true",
                   help="Wipe out the graph before loading")
    p.add_argument("-y", "--yes", action="store_true",
                   help="Confirm deletion / wiping (non-interactive gate)")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("-M", "--max-violations", nargs="?", type=int)
    p.add_argument("--temp-folder", help="Report/temp output directory")
    return p


def process_arguments(argv=None) -> LoaderConfig:
    args = build_parser().parse_args(argv)
    cfg = (
        LoaderConfig.from_yaml(args.config_file)
        if args.config_file
        else LoaderConfig()
    )
    cfg.merge_oncli(args)
    if cfg.graph_root is None:
        cfg.graph_root = "./graph_lake"
    problems = cfg.validate()
    if problems:
        raise SystemExit("\n".join(problems))
    return cfg


def discover_files(spark: SparkSession, dataset: str) -> list[tuple[str, str]]:
    """(node_type, path) per TSV, type read from each file's ``type``
    column — preserving the listing order (file order is load order)."""
    out = []
    paths = sorted(
        glob.glob(os.path.join(dataset, "*.txt"))
        + glob.glob(os.path.join(dataset, "*.tsv"))
    )
    for path in paths:
        raw = tsv.read_tsv(spark, path)
        if "type" not in raw.columns:
            out.append((None, path))
            continue
        row = raw.select("type").first()
        out.append((row["type"].strip() if row and row["type"] else None, path))
    return out


def _validate_file(spark, cfg, model, node_type, path, report_dir):
    """Header + value validation for one file; writes the (capped) grouped
    report while the error relation is cached.  Returns (ok, n_errors,
    n_warnings)."""
    raw = tsv.read_tsv(spark, path)
    header = validate_header(raw.columns, node_type, model)
    prep = tsv.prepare_nodes(raw, node_type, model).withColumn(
        "_row", F.monotonically_increasing_id()
    )
    # the pass/fail gate counts UNCAPPED violations — max_violations bounds
    # only the persisted REPORT (the reference's display semantics, V8);
    # gating on the capped relation would let max_violations=0 load
    # invalid files and underreport true error counts
    all_errs = validation_errors(
        prep, node_type, model, row_id_col="_row"
    ).persist()
    try:
        n_err = all_errs.filter(F.col("severity") == "error").count()
        n_warn = all_errs.filter(F.col("severity") != "error").count()
        errs = cap_violations(all_errs, cfg.max_violations)
        header_rows = [
            (-1, prop, None, reason, "error")
            for prop, reason in header["errors"]
        ] + [
            (-1, prop, None, reason, "warning")
            for prop, reason in header["warnings"]
        ]
        if header_rows:
            hdr_df = spark.createDataFrame(
                header_rows,
                "row_id long, property string, value string, reason string,"
                " severity string",
            )
            errs = errs.unionByName(hdr_df)
        n_err += sum(1 for _ in header["errors"])
        n_warn += sum(1 for _ in header["warnings"])
        export_report(errs, report_dir)
        return n_err == 0, n_err, n_warn
    finally:
        all_errs.unpersist()


def main(argv=None, spark: SparkSession | None = None) -> dict:
    cfg = process_arguments(argv)
    own_spark = spark is None
    if own_spark:
        from .session import get_spark

        spark = get_spark("icdc-dataloader-spark")
    if cfg.ignored:
        print(
            "NOTE: infrastructure config keys have no lake-engine meaning "
            f"and were ignored: {sorted(cfg.ignored)}",
            file=sys.stderr,
        )

    model = Model.from_yaml(cfg.schema_files, cfg.prop_file)
    registry = None
    if cfg.plugins:
        registry = PluginRegistry()
        for spec in cfg.plugins:
            registry.load_plugin(spec.module, spec.class_name, spec.params)

    stats: dict = {"mode": cfg.loading_mode, "files": {}, "skipped": []}

    if cfg.wipe_db and cfg.dry_run:
        # "validations only" must never destroy data, whatever else is set
        raise SystemExit("--dry-run and --wipe-db are mutually exclusive")
    if cfg.wipe_db:
        if not cfg.yes:
            raise SystemExit(
                "--wipe-db would delete ALL data; pass -y/--yes to confirm "
                "(non-interactive confirm gate)"
            )
        wiped = 0
        if os.path.isdir(cfg.graph_root):
            for d in sorted(os.listdir(cfg.graph_root)):
                full = os.path.join(cfg.graph_root, d)
                if os.path.isdir(os.path.join(full, "_log")):
                    LakeTable(full).wipe()
                    wiped += 1
        stats["lakes_wiped"] = wiped

    discovered = discover_files(spark, cfg.dataset)
    to_load: list[tuple[str, str]] = []
    os.makedirs(cfg.temp_folder, exist_ok=True)
    for node_type, path in discovered:
        name = os.path.basename(path)
        if node_type is None or node_type not in model.nodes:
            stats["skipped"].append(
                {"file": name, "reason": f"unknown node type: {node_type}"}
            )
            continue
        if cfg.cheat_mode:
            to_load.append((node_type, path))
            stats["files"][name] = {"type": node_type, "validated": False}
            continue
        report_dir = os.path.join(cfg.temp_folder, f"report-{name}")
        ok, n_err, n_warn = _validate_file(
            spark, cfg, model, node_type, path, report_dir
        )
        stats["files"][name] = {
            "type": node_type,
            "validated": True,
            "errors": n_err,
            "warnings": n_warn,
            "report": report_dir,
        }
        if ok:
            to_load.append((node_type, path))
        else:
            stats["skipped"].append(
                {"file": name, "reason": f"{n_err} validation errors"}
            )

    if cfg.dry_run:
        stats["dry_run"] = True
    elif cfg.loading_mode == DELETE_MODE:
        if not cfg.yes:
            raise SystemExit(
                "DELETE_MODE removes data; pass -y/--yes to confirm"
            )
        gl = GraphLoader(spark, cfg.graph_root, model, registry=registry)
        deleted = {"nodes": 0, "relationships": 0}
        for node_type, path in to_load:
            id_field = model.id_field(node_type)
            raw = tsv.read_tsv(spark, path)
            # seed ids stay a DataFrame end-to-end (semi-join inside
            # delete_cascade) — a machine-generated delete manifest never
            # becomes a driver-memory list
            n, r = gl.delete_cascade(
                node_type, raw.select(F.trim(F.col(id_field)))
            )
            deleted["nodes"] += n
            deleted["relationships"] += r
        stats["deleted"] = deleted
    elif to_load:
        gl = GraphLoader(spark, cfg.graph_root, model, registry=registry)
        stats["load"] = gl.load_files(
            to_load, mode=MODE_TO_OP[cfg.loading_mode]
        )

    print(json.dumps(stats, default=str))
    if own_spark:
        spark.stop()
    return stats


if __name__ == "__main__":
    main()
