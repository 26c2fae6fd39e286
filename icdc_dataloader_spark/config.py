"""Loader configuration: the reference's YAML-config surface, Spark-side.

Accepts the reference's own ``data-loader-config.example.yml`` shape
unmodified (config.py:13-116 key set): a user points this engine at the
config file they already run the reference with.  Graph-database
connection blocks (``neo4j``, ``sqs``, ``indexd``, s3 staging keys) have
no meaning for a lake-backed engine — they are accepted, collected under
``ignored`` and reported once, never a parse error.

New (engine-specific) key: ``graph_root`` — the directory holding the
node/edge lake tables (the analogue of the Neo4j URI).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

DEFAULT_MAX_VIOLATIONS = 1000000  # loader.py:27 DEFAULT_MAX_VIOLATIONS
DEFAULT_TEMP_FOLDER = "tmp"

UPSERT_MODE = "UPSERT_MODE"  # bento.common.utils constants (public repo)
NEW_MODE = "NEW_MODE"
DELETE_MODE = "DELETE_MODE"

# reference CLI mode names -> merge op names used by plans/merge.py
MODE_TO_OP = {UPSERT_MODE: "upsert", NEW_MODE: "new", DELETE_MODE: "delete"}

# config keys that configure infrastructure this engine replaces
_IGNORED_KEYS = {
    "neo4j", "sqs", "indexd", "url", "s3_bucket", "s3_folder",
    "backup_folder", "no_backup", "database_type", "memgraph_snapshot_dir",
    "upload_log_dir", "split_transactions",
    # consumed only by the reference's prefect wrapper (orchestration host)
    "no_parents",
}


@dataclass
class PluginSpec:
    """plugins: [{module, class, params}] (config.py:6-10)."""

    module: str
    class_name: str
    params: dict | None = None


@dataclass
class LoaderConfig:
    dataset: str | None = None
    schema_files: list[str] = field(default_factory=list)
    prop_file: str | None = None
    graph_root: str | None = None
    loading_mode: str = UPSERT_MODE
    cheat_mode: bool = False
    dry_run: bool = False
    wipe_db: bool = False
    yes: bool = False  # no_confirmation (V10: non-interactive confirm gate)
    verbose: bool = False
    max_violations: int = DEFAULT_MAX_VIOLATIONS
    temp_folder: str = DEFAULT_TEMP_FOLDER
    plugins: list = field(default_factory=list)
    ignored: dict = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, config_file: str) -> "LoaderConfig":
        import yaml

        if not os.path.isfile(config_file):
            raise FileNotFoundError(
                f'Can NOT open configuration file "{config_file}"!'
            )
        with open(config_file) as fh:
            doc = yaml.safe_load(fh) or {}
        raw = doc.get("Config") if isinstance(doc, dict) else None
        if not isinstance(raw, dict):
            raise ValueError(
                f'"{config_file}" has no top-level "Config" mapping — is it '
                "a data-loader configuration file?"
            )

        cfg = cls()
        cfg.dataset = raw.get("dataset")
        schema = raw.get("schema")
        cfg.schema_files = list(schema) if schema else []
        cfg.prop_file = raw.get("prop_file")
        cfg.graph_root = raw.get("graph_root")
        cfg.loading_mode = raw.get("loading_mode") or UPSERT_MODE
        cfg.cheat_mode = bool(raw.get("cheat_mode"))
        cfg.dry_run = bool(raw.get("dry_run"))
        cfg.wipe_db = bool(raw.get("wipe_db"))
        cfg.yes = bool(raw.get("no_confirmation"))
        cfg.verbose = bool(raw.get("verbose"))
        if raw.get("max_violations") is not None:
            cfg.max_violations = int(raw["max_violations"])
        if raw.get("temp_folder"):
            cfg.temp_folder = raw["temp_folder"]
        for p in raw.get("plugins") or []:
            # the reference example file itself contains a 'moduel' typo
            # entry — skip malformed specs the way its loader would fail
            # them at import time, but without aborting the parse
            if "module" in p and "class" in p:
                cfg.plugins.append(
                    PluginSpec(p["module"], p["class"], p.get("params"))
                )
            else:
                cfg.ignored.setdefault("plugins_malformed", []).append(p)
        for k in _IGNORED_KEYS:
            if k in raw and raw[k] is not None:
                cfg.ignored[k] = raw[k]
        return cfg

    def merge_oncli(self, args) -> "LoaderConfig":
        """CLI args override file values (loader.py process_arguments
        precedence)."""
        if getattr(args, "dataset", None):
            self.dataset = args.dataset
        if getattr(args, "schema", None):
            self.schema_files = list(args.schema)
        if getattr(args, "prop_file", None):
            self.prop_file = args.prop_file
        if getattr(args, "graph_root", None):
            self.graph_root = args.graph_root
        if getattr(args, "mode", None):
            self.loading_mode = args.mode
        if getattr(args, "cheat_mode", False):
            self.cheat_mode = True
        if getattr(args, "dry_run", False):
            self.dry_run = True
        if getattr(args, "wipe_db", False):
            self.wipe_db = True
        if getattr(args, "yes", False):
            self.yes = True
        if getattr(args, "verbose", False):
            self.verbose = True
        if getattr(args, "max_violations", None) is not None:
            # 0 is a legitimate value (empty report); only absence keeps
            # the file/default value — same semantics as the YAML channel
            self.max_violations = int(args.max_violations)
        if getattr(args, "temp_folder", None):
            self.temp_folder = args.temp_folder
        return self

    def validate(self) -> list[str]:
        """Required-field checks (loader.py:66-93), returned not sys.exit'd."""
        problems = []
        if not self.dataset:
            problems.append(
                "No dataset specified! Please specify a dataset in config "
                "file or with CLI argument --dataset"
            )
        elif not os.path.isdir(self.dataset):
            problems.append(f"{self.dataset} is not a directory!")
        if not self.prop_file:
            problems.append(
                "No properties file specified! Please specify a properties "
                "file in config file or with CLI argument --prop-file"
            )
        if not self.schema_files:
            problems.append(
                "No schema file specified! Please specify at least one "
                "schema file in config file or with CLI argument --schema"
            )
        if self.loading_mode not in MODE_TO_OP:
            problems.append(f"{self.loading_mode} is not a valid loading mode!")
        return problems
