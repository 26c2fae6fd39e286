"""S10 archive extraction: distributed unzip/untar parity with the
reference's staging+manifest behavior (file_loader.py:233-341)."""

import hashlib
import io
import tarfile
import zipfile

import pytest

from icdc_dataloader_spark.sources.archive import read_archives


@pytest.fixture()
def drop_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    # zip with two members + a directory entry + a zip-slip attempt
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("data/a.tsv", "type\tid\nrepo_file\tr1\n")
        zf.writestr("data/b.bin", b"\x00\x01\x02binary")
        zf.writestr("dir/", "")
        zf.writestr("../escape.txt", "evil")
    (d / "drop1.zip").write_bytes(zbuf.getvalue())
    # tar.gz with one member
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        payload = b"hello tar member"
        info = tarfile.TarInfo("nested/c.txt")
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    (d / "drop2.tar.gz").write_bytes(tbuf.getvalue())
    # garbage file that must yield an error row, not a task failure
    (d / "drop3.zip").write_bytes(b"not an archive at all")
    return str(d)


def test_members_extracted_with_manifest_hashes(spark, drop_dir):
    out = read_archives(spark, drop_dir).collect()
    by_member = {r["member"]: r for r in out if r["member"]}

    a = by_member["data/a.tsv"]
    assert bytes(a["payload"]) == b"type\tid\nrepo_file\tr1\n"
    assert a["n_bytes"] == len(b"type\tid\nrepo_file\tr1\n")
    assert a["md5"] == hashlib.md5(bytes(a["payload"])).hexdigest()
    assert a["sha256"] == hashlib.sha256(bytes(a["payload"])).hexdigest()
    assert a["error"] is None

    assert bytes(by_member["data/b.bin"]["payload"]) == b"\x00\x01\x02binary"
    assert bytes(by_member["nested/c.txt"]["payload"]) == b"hello tar member"

    # zip-slip guarded: emitted as error row with no payload
    esc = by_member["../escape.txt"]
    assert esc["error"] == "unsafe_path" and esc["payload"] is None

    # directory entries are not rows
    assert "dir/" not in by_member


def test_unreadable_archive_is_error_row_not_failure(spark, drop_dir):
    out = read_archives(spark, drop_dir).collect()
    bad = [r for r in out if r["error"] == "unreadable_archive"]
    assert len(bad) == 1
    assert bad[0]["archive"].endswith("drop3.zip")


def test_member_size_cap(spark, drop_dir):
    out = read_archives(spark, drop_dir, max_member_bytes=5).collect()
    capped = {r["member"] for r in out if r["error"] == "member_too_large"}
    assert "data/a.tsv" in capped and "nested/c.txt" in capped
