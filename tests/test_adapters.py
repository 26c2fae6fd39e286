"""§2.10 source adapters: duck-typed field mapping (base_adapter.py) and
the distributed copier pass with same-size skip (copier.py:167-170) and
md5 verification (file_loader.py:98-113)."""

import hashlib
import os

import pytest

from icdc_dataloader_spark.sources.adapters import (
    BaseSourceAdapter,
    LocalFileAdapter,
    UrlSourceAdapter,
    register_adapter,
    stage_files,
)


def test_register_rejects_wrong_shape():
    class NotAnAdapter:
        pass

    with pytest.raises(TypeError):
        register_adapter(NotAnAdapter())


def test_normalize_canonical_fields(spark):
    df = spark.createDataFrame(
        [("a.bin", "/data/a.bin", "m1", 10, None, "extra1")],
        "file_name string, file_location string, md5sum string, "
        "file_size long, acl string, other string",
    )
    out = LocalFileAdapter().normalize(df).collect()[0]
    assert out["file_name"] == "a.bin"
    assert out["org_url"] == "file:///data/a.bin"
    assert out["org_md5"] == "m1" and out["org_size"] == 10
    assert out["acl"] == "['Open']"  # DEFAULT_ACL fallback
    assert out["other"] == "extra1"  # payload kept, adapter fields dropped

    url = UrlSourceAdapter().normalize(
        spark.createDataFrame(
            [("x", "https://h/x.bin")], "file_name string, file_location string"
        )
    ).collect()[0]
    assert url["org_url"] == "https://h/x.bin"


def test_stage_files_copies_verifies_and_skips(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    payloads = {"a.bin": b"alpha" * 100, "b.bin": b"beta" * 50}
    for name, data in payloads.items():
        (src / name).write_bytes(data)
    manifest = spark.createDataFrame(
        [
            ("a.bin", str(src / "a.bin"),
             hashlib.md5(payloads["a.bin"]).hexdigest(), len(payloads["a.bin"])),
            ("b.bin", str(src / "b.bin"), "WRONG_MD5", len(payloads["b.bin"])),
            ("missing.bin", str(src / "missing.bin"), None, 1),
        ],
        "file_name string, file_location string, md5sum string, file_size long",
    )
    dest = str(tmp_path / "dest")
    out = {
        r["file_name"]: r
        for r in stage_files(
            spark, LocalFileAdapter(), manifest, dest
        ).collect()
    }
    assert out["a.bin"]["status"] == "copied" and out["a.bin"]["md5_match"] is True
    assert out["a.bin"]["size"] == 500
    assert out["b.bin"]["md5_match"] is False  # verification catches mismatch
    assert out["missing.bin"]["status"].startswith("error")
    assert (tmp_path / "dest" / "a.bin").read_bytes() == payloads["a.bin"]

    # second pass with the previous manifest: same-size files are SKIPPED
    prev = stage_files(spark, LocalFileAdapter(), manifest, dest)
    again = {
        r["file_name"]: r["status"]
        for r in stage_files(
            spark, LocalFileAdapter(), manifest, dest,
            previous=prev.filter("status = 'copied'"),
        ).collect()
    }
    assert again["a.bin"] == "skipped" and again["b.bin"] == "skipped"
    assert again["missing.bin"].startswith("error")  # never staged -> retried


def test_unsupported_scheme_reported_not_raised(spark, tmp_path):
    manifest = spark.createDataFrame(
        [("x.bin", "s3://bucket/x.bin", None, 1)],
        "file_name string, file_location string, md5sum string, file_size long",
    )
    out = stage_files(
        spark, UrlSourceAdapter(), manifest, str(tmp_path / "d")
    ).collect()[0]
    assert out["status"] == "unsupported_scheme"


def test_file_format_derivation(spark):
    """P11: file_copier.py:189-201 format table, compression suffixes skipped."""
    from icdc_dataloader_spark.sources.adapters import file_format_expr
    from pyspark.sql import functions as F

    cases = [
        ("sample.TXT", "txt"),
        ("reads.fastq.gz", "fastq"),
        ("archive.tar.bz2", "tar"),
        ("bundle.zip", "zip"),          # bare compression ext IS the format
        ("a.b.c.xz", "c"),
        ("noextension", None),
        (".bashrc", "bashrc"),
        ("image.svs", "svs"),
        ("x.7z", "7z"),
        ("x.y.7z", "y"),
    ]
    df = spark.createDataFrame([(n,) for n, _ in cases], "file_name string")
    got = {
        r["file_name"]: r["fmt"]
        for r in df.withColumn("fmt", file_format_expr(F.col("file_name"))).collect()
    }
    assert got == {n: f for n, f in cases}


def test_normalize_emits_file_format(spark):
    from icdc_dataloader_spark.sources.adapters import UrlSourceAdapter

    df = spark.createDataFrame(
        [("https://x.org/d/reads.fastq.gz", "abc", 10)],
        "file_location string, md5sum string, file_size long",
    )
    out = UrlSourceAdapter().normalize(df).collect()[0]
    assert out["file_name"] == "reads.fastq.gz"
    assert out["file_format"] == "fastq"
