"""UUID verify/repair parity with reference uuid_util.py (get_uuid chain)."""

from icdc_dataloader_spark.functions.identity import get_uuid
from icdc_dataloader_spark.operators.uuid_check import repair_uuids, verify_uuids

DOMAIN = "caninecommons.cancer.gov"


def test_verify_and_repair(spark):
    good = get_uuid(DOMAIN, "file", "s3://bucket/a.bam")
    rows = [
        ("s3://bucket/a.bam", good),            # correct
        ("s3://bucket/b.bam", "not-a-uuid"),    # wrong -> repaired
    ]
    df = spark.createDataFrame(rows, "file_location string, uuid string")
    checked = verify_uuids(df, DOMAIN).collect()
    by_sig = {r["file_location"]: r for r in checked}
    assert by_sig["s3://bucket/a.bam"]["_uuid_ok"]
    assert not by_sig["s3://bucket/b.bam"]["_uuid_ok"]
    assert by_sig["s3://bucket/b.bam"]["_repaired_uuid"] == get_uuid(
        DOMAIN, "file", "s3://bucket/b.bam"
    )

    fixed, (total, matched, repaired) = repair_uuids(df, domain=DOMAIN)
    assert (total, matched, repaired) == (2, 1, 1)
    vals = {r["file_location"]: r["uuid"] for r in fixed.collect()}
    assert vals["s3://bucket/b.bam"] == get_uuid(DOMAIN, "file", "s3://bucket/b.bam")


def test_indexd_mode_preserves_guid_prefix(spark):
    sig = "s3://bucket/c.bam"
    df = spark.createDataFrame(
        [(sig, "dg.4DFC/wrong-uuid")], "file_location string, uuid string"
    )
    checked = verify_uuids(df, DOMAIN, indexd_mode=True).collect()[0]
    assert not checked["_uuid_ok"]
    assert checked["_repaired_uuid"] == f"dg.4DFC/{get_uuid(DOMAIN, 'file', sig)}"


def test_indexd_mode_bare_uuid_no_invented_prefix(spark):
    sig = "s3://bucket/d.bam"
    df = spark.createDataFrame(
        [(sig, "just-wrong")], "file_location string, uuid string"
    )
    checked = verify_uuids(df, DOMAIN, indexd_mode=True).collect()[0]
    assert not checked["_uuid_ok"]
    # repaired value is the bare expected uuid — NOT 'just-wrong/<uuid>'
    assert checked["_repaired_uuid"] == get_uuid(DOMAIN, "file", sig)
