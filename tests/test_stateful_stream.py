"""applyInPandasWithState burst sessions over a file stream."""

import os

import pandas as pd

from icdc_dataloader_spark.streaming.stateful import change_bursts


def test_gap_closes_burst_and_open_burst_stays_in_state(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    base = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame(
        {
            "repo": ["r1"] * 3 + ["r1", "r1"] + ["r2"],
            "ts": [
                base,
                base + pd.Timedelta(seconds=10),
                base + pd.Timedelta(seconds=20),
                # > 300s gap: closes the first burst
                base + pd.Timedelta(seconds=1000),
                base + pd.Timedelta(seconds=1010),
                base + pd.Timedelta(seconds=5),
            ],
        }
    )
    rows["ts"] = rows["ts"].astype("datetime64[us]")
    rows.to_parquet(os.path.join(str(src), "part-0.parquet"))

    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        change_bursts(stream, gap_seconds=300)
        .writeStream.format("memory")
        .queryName("bursts")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        (r["repo"], r["n_events"], r["closed_by"])
        for r in spark.sql("select * from bursts").collect()
    }
    # r1's first 3 events close by gap; the 1000s/1010s burst and all of
    # r2 stay OPEN in state (no timeout fired in an availableNow drain)
    assert out == {("r1", 3, "gap")}
    row = spark.sql("select * from bursts").collect()[0]
    assert row["burst_start"] == base and row["burst_end"] == base + pd.Timedelta(
        seconds=20
    )


def test_cross_batch_late_event_widens_burst_not_splits(spark, tmp_path):
    """A late event arriving in a later micro-batch must widen the open
    burst (start=min/end=max), never move its end backwards."""
    src = tmp_path / "s2"
    src.mkdir()
    ck = str(tmp_path / "ck2")
    base = pd.Timestamp("2024-01-01")

    def write(name, seconds):
        pdf = pd.DataFrame(
            {"repo": ["r1"] * len(seconds),
             "ts": [base + pd.Timedelta(seconds=s) for s in seconds]}
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(str(src), name))

    schema = None
    rows = []

    def drain():
        nonlocal schema
        if schema is None:
            schema = spark.read.parquet(str(src)).schema
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            change_bursts(stream, gap_seconds=300)
            .writeStream.foreachBatch(
                lambda df, _eid: rows.extend(df.collect())
            )
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write("p0.parquet", [100])
    drain()
    # batch 2: one LATE event (10s, within gap of the open burst) and one
    # far event (500s) that closes it by gap
    write("p1.parquet", [10, 500])
    drain()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_events"] == 2 and r["closed_by"] == "gap"
    assert r["burst_start"] == base + pd.Timedelta(seconds=10)
    assert r["burst_end"] == base + pd.Timedelta(seconds=100)
    assert r["burst_end"] >= r["burst_start"]
