"""Source adapters (§2.10 — the reference's second extension point).

The reference's file copier is parameterized by duck-typed adapters
(adapters/base_adapter.py:6-141) that map a raw per-file record to the
canonical fields the copier needs: file name, original URL, md5, size, ACL
(local_adapter.py / web_adapter.py provide ``get_org_url``).  The copier
then streams each file and SKIPS files whose destination already has the
same size (copier.py:167-170 — the idempotence contract).

Set-oriented analogue: an adapter normalizes a MANIFEST DataFrame (one row
per file) to canonical columns, and :func:`stage_files` is the copier —
a distributed pass that copies/verifies every pending file and emits the
copy manifest.  The per-file byte work runs inside ``mapInPandas`` (Arrow
batches of rows; file IO is genuinely imperative per-partition work — the
documented exception to expression-only operators).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CANONICAL = ["file_name", "file_format", "org_url", "org_md5", "org_size", "acl"]
DEFAULT_ACL = "['Open']"  # base_adapter.py:22

# compression suffixes ignored when deriving file_format
# (file_copier.py:189-201)
COMPRESSION_SUFFIXES = ["gz", "zip", "7z", "bz2", "xz", "rar"]

_REQUIRED_ATTRS = ("org_url_expr", "normalize")


def file_format_expr(name: F.Column) -> F.Column:
    """P11 (file_copier.py:189-201 ``_parse_file_format``): the lowercased
    final extension, skipping ONE trailing compression suffix when another
    extension precedes it — ``a.txt.gz`` -> txt, ``a.gz`` -> gz,
    ``noext`` -> NULL.  Pure Catalyst expressions (whole-stage codegen)."""
    parts = F.split(F.lower(name), r"\.")
    n = F.size(parts)
    last = F.element_at(parts, -1)
    return (
        F.when(n < 2, F.lit(None).cast("string"))
        .when(last.isin(COMPRESSION_SUFFIXES) & (n > 2), F.element_at(parts, -2))
        .otherwise(last)
    )


class BaseSourceAdapter:
    """Field-mapping + URL synthesis, duck-typed like the reference.

    Subclasses must provide ``org_url_expr(df) -> Column`` (the reference's
    abstract ``get_org_url``); everything else has base implementations
    (base_adapter.py: filter_fields / get_file_name / get_org_md5 /
    get_org_size are the row-wise versions of these expressions).
    """

    def __init__(
        self,
        name_field: str = "file_name",
        md5_field: str = "md5sum",
        size_field: str = "file_size",
        acl_field: str = "acl",
        location_field: str = "file_location",
    ):
        self.name_field = name_field
        self.md5_field = md5_field
        self.size_field = size_field
        self.acl_field = acl_field
        self.location_field = location_field

    def _path_expr(self, df) -> F.Column:
        """location_field if present/non-empty else name_field
        (base_adapter._get_path)."""
        cols = set(df.columns)
        loc = (
            F.col(self.location_field)
            if self.location_field in cols
            else F.lit(None).cast("string")
        )
        name = (
            F.col(self.name_field)
            if self.name_field in cols
            else F.lit(None).cast("string")
        )
        return F.coalesce(
            F.when(loc.isNotNull() & (loc != ""), loc), name
        )

    def org_url_expr(self, df) -> F.Column:  # pragma: no cover - abstract
        raise NotImplementedError("adapter must provide org_url_expr")

    def normalize(self, df: DataFrame) -> DataFrame:
        """Raw manifest -> canonical columns + the original payload minus
        adapter fields (base_adapter.filter_fields)."""
        cols = set(df.columns)
        name = F.element_at(F.split(self._path_expr(df), "/"), -1)
        md5 = (
            F.col(self.md5_field)
            if self.md5_field in cols
            else F.lit(None).cast("string")
        )
        size = (
            F.col(self.size_field).cast("long")
            if self.size_field in cols
            else F.lit(None).cast("long")
        )
        acl = (
            F.coalesce(F.col(self.acl_field), F.lit(DEFAULT_ACL))
            if self.acl_field in cols
            else F.lit(DEFAULT_ACL)
        )
        keep = [
            c
            for c in df.columns
            if c
            not in {
                self.name_field,
                self.md5_field,
                self.size_field,
                self.acl_field,
                self.location_field,
            }
        ]
        return df.select(
            name.alias("file_name"),
            file_format_expr(name).alias("file_format"),
            self.org_url_expr(df).alias("org_url"),
            md5.alias("org_md5"),
            size.alias("org_size"),
            acl.alias("acl"),
            *keep,
        )


class LocalFileAdapter(BaseSourceAdapter):
    """local_adapter.py analogue: files on a local/posix path."""

    def __init__(self, working_dir: str = "", **kw):
        super().__init__(**kw)
        self.working_dir = working_dir.rstrip("/")

    def org_url_expr(self, df) -> F.Column:
        path = self._path_expr(df)
        if self.working_dir:
            path = F.when(
                path.startswith("/"), path
            ).otherwise(F.concat(F.lit(self.working_dir + "/"), path))
        return F.concat(F.lit("file://"), path)


class UrlSourceAdapter(BaseSourceAdapter):
    """web_adapter.py analogue: the location field already holds the URL."""

    def org_url_expr(self, df) -> F.Column:
        return self._path_expr(df)


def register_adapter(adapter) -> None:
    """Duck-typed contract check (the reference validates plugin shape at
    load, data_loader.py:153-167)."""
    missing = [a for a in _REQUIRED_ATTRS if not hasattr(adapter, a)]
    if missing:
        raise TypeError(
            f"adapter {type(adapter).__name__} missing attrs: {missing}"
        )


def stage_files(
    spark: SparkSession,
    adapter,
    manifest: DataFrame,
    dest_dir: str,
    previous: DataFrame | None = None,
) -> DataFrame:
    """The copier pass (copier.py), set-oriented.

    - normalize the manifest through the adapter;
    - SKIP files already staged with the same size (copier.py:167-170);
    - copy the rest inside ``mapInPandas`` (one Arrow batch of file records
      per task — the file bytes never touch the driver), computing actual
      size + sha256/md5 during the copy (file_loader.py:98-113 hashes);
    - return the copy manifest (status: copied / skipped / error) with
      md5-vs-original verification where the source provided one.

    Only ``file://`` URLs are materialized in this sandbox; other schemes
    come back status='unsupported_scheme' (the reference shells out to
    requests/S3 — network is out of scope here, the orchestration is not).
    """
    register_adapter(adapter)
    norm = adapter.normalize(manifest)
    if previous is not None:
        prev = previous.select(
            F.col("file_name").alias("_p_name"), F.col("size").alias("_p_size")
        ).distinct()
        norm = norm.join(
            prev,
            (norm["file_name"] == prev["_p_name"])
            & (norm["org_size"] == prev["_p_size"]),
            "left",
        ).withColumn("skip_copy", F.col("_p_name").isNotNull()).drop(
            "_p_name", "_p_size"
        )
    else:
        norm = norm.withColumn("skip_copy", F.lit(False))

    out_schema = (
        "file_name string, org_url string, size long, sha256 string, "
        "md5 string, status string, md5_match boolean"
    )
    dest = dest_dir

    def copy_batch(batches):
        import hashlib
        import shutil

        import pandas as pd

        os.makedirs(dest, exist_ok=True)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.skip_copy:
                    rows.append(
                        (r.file_name, r.org_url, r.org_size, None, None,
                         "skipped", None)
                    )
                    continue
                url = r.org_url or ""
                if not url.startswith("file://"):
                    rows.append(
                        (r.file_name, url, None, None, None,
                         "unsupported_scheme", None)
                    )
                    continue
                src = url[len("file://"):]
                try:
                    target = os.path.join(dest, r.file_name)
                    shutil.copyfile(src, target)
                    h_sha, h_md5, n = hashlib.sha256(), hashlib.md5(), 0
                    with open(target, "rb") as fh:
                        for chunk in iter(lambda: fh.read(1 << 20), b""):
                            h_sha.update(chunk)
                            h_md5.update(chunk)
                            n += len(chunk)
                    md5 = h_md5.hexdigest()
                    match = (md5 == r.org_md5) if r.org_md5 else None
                    rows.append(
                        (r.file_name, url, n, h_sha.hexdigest(), md5,
                         "copied", match)
                    )
                except OSError as e:
                    rows.append(
                        (r.file_name, url, None, None, None,
                         f"error: {e.__class__.__name__}", None)
                    )
            yield pd.DataFrame(
                rows,
                columns=["file_name", "org_url", "size", "sha256", "md5",
                         "status", "md5_match"],
            )

    cols = ["file_name", "org_url", "org_md5", "org_size", "skip_copy"]
    return norm.select(*cols).mapInPandas(copy_batch, out_schema)
