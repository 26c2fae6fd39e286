"""S10 — archive extraction as a distributed source.

Reference: file_loader.py:233-341 (`FileLoader.extract`): an SQS event names
a zip/tar drop in S3; the service downloads it, extracts members to a
staging prefix, hashes each member and builds a manifest for the loader.

Spark-first shape: `spark.read.format("binaryFile")` turns each archive
into ONE row (path, bytes); an Arrow-batched `mapInPandas` explodes every
archive into member rows using stdlib ``zipfile``/``tarfile`` — no
temp-file staging, no driver involvement, one task per archive (the
natural parallel unit: archives are indivisible byte streams).  Member
hashing (the reference's manifest md5/size, file_loader.py:98-113) is then
native Catalyst (`sha2`/`md5`/`length`) over the exploded rows.

Scale notes:
- parallelism = number of archives; a single giant archive is a single
  task by construction (same as any engine — the format is sequential).
- each archive is materialized in executor memory once (binaryFile keeps
  the file as one cell).  Bound member blow-up with ``max_member_bytes``:
  oversize members are emitted as error rows, not buffered.
"""

from __future__ import annotations

import io
import os
import posixpath
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEMBER_SCHEMA = (
    "archive string, member string, payload binary, n_bytes long, error string"
)


def _safe_name(name: str) -> bool:
    # zip-slip guard: reject absolute paths and parent escapes
    norm = posixpath.normpath(name)
    return not (norm.startswith("/") or norm.startswith(".."))


def _iter_zip(data: bytes, cap: int):
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if not _safe_name(info.filename):
                yield info.filename, None, info.file_size, "unsafe_path"
            elif info.file_size > cap:
                yield info.filename, None, info.file_size, "member_too_large"
            else:
                yield info.filename, zf.read(info), info.file_size, None


def _iter_tar(data: bytes, cap: int):
    # transparent compression: plain / gz / bz2 / xz
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
        for info in tf:
            if not info.isfile():
                continue
            if not _safe_name(info.name):
                yield info.name, None, info.size, "unsafe_path"
            elif info.size > cap:
                yield info.name, None, info.size, "member_too_large"
            else:
                fh = tf.extractfile(info)
                yield info.name, (fh.read() if fh else b""), info.size, None


def explode_archives(
    archives: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    max_member_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Explode archive rows (path, bytes) into member rows.

    Format is sniffed per archive from the name, falling back to content
    probing (zip magic ``PK``), mirroring the reference's suffix dispatch
    (file_loader.py:244-258).  Unreadable archives yield ONE error row
    (error='unreadable_archive') instead of failing the task — a poisoned
    drop must not kill the drain (§2.9 retry/park semantics).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"archive": [], "member": [], "payload": [],
                    "n_bytes": [], "error": []}

            def emit(a, m, p, n, e):
                rows["archive"].append(a)
                rows["member"].append(m)
                rows["payload"].append(p)
                rows["n_bytes"].append(n)
                rows["error"].append(e)

            for apath, data in zip(pdf[path_col], pdf[content_col]):
                data = bytes(data)
                name = os.path.basename(str(apath)).lower()
                # buffer per archive: a corrupt member AFTER valid ones must
                # not leave partial members plus an archive-level error row
                # downstream — the archive commits all-or-error
                buffered: list[tuple] = []
                try:
                    if name.endswith(".zip") or data[:2] == b"PK":
                        it = _iter_zip(data, max_member_bytes)
                    elif name.endswith((".tar", ".tar.gz", ".tgz",
                                        ".tar.bz2", ".tar.xz")):
                        it = _iter_tar(data, max_member_bytes)
                    else:  # probe tar last (no cheap magic at offset 0)
                        it = _iter_tar(data, max_member_bytes)
                    for member, payload, n, err in it:
                        buffered.append((str(apath), member, payload, n, err))
                except Exception:
                    buffered = [(str(apath), None, None, len(data),
                                 "unreadable_archive")]
                for row in buffered:
                    emit(*row)
            yield pd.DataFrame(rows)

    return archives.select(
        F.col(path_col).alias(path_col), F.col(content_col).alias(content_col)
    ).mapInPandas(run, MEMBER_SCHEMA)


def read_archives(
    spark: SparkSession,
    glob: str,
    max_member_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """binaryFile scan → member rows with the reference's manifest columns.

    Output: archive, member, payload, n_bytes, error, md5, sha256 — md5 per
    member is the manifest invariant the reference validates downstream
    (stream_file_validator.py md5 check; file_loader.py:98-113).
    """
    raw = spark.read.format("binaryFile").load(glob).select(
        F.col("path"), F.col("content")
    )
    members = explode_archives(
        raw, path_col="path", content_col="content",
        max_member_bytes=max_member_bytes,
    )
    return members.withColumn(
        "md5", F.when(F.col("payload").isNotNull(), F.md5(F.col("payload")))
    ).withColumn(
        "sha256", F.when(F.col("payload").isNotNull(), F.sha2(F.col("payload"), 256))
    )
