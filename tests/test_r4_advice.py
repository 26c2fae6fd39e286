"""Round-4 ADVICE regression tests:

- session_windows oracle SQL now CASTs its sums to BIGINT so DuckDB's
  HUGEINT never reaches the driver's value hash as float64;
- DEFAULT_MAX_VIOLATIONS matches the reference's loader.py:27 value;
- per-file _seq assignment is a single create_map lookup (no N-deep
  WHEN/OTHERWISE analyzer chain at thousand-file scale);
- delete_cascade accepts a DataFrame of seed ids (semi-join; no driver
  materialization) and matches the list path exactly;
- the tombstone-GC late_horizon contract: a lagging source partition whose
  seqs trail another partition's applied max is OUT of the late_horizon=0
  contract (documented hazard) and IN contract once late_horizon covers
  the lag — the deleted row must stay deleted.
"""

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from icdc_dataloader_spark.config import DEFAULT_MAX_VIOLATIONS
from icdc_dataloader_spark.plans.graph_loader import GraphLoader, file_seq_expr
from icdc_dataloader_spark.plans.merge import read_state
from icdc_dataloader_spark.queries import SESSION_SQL
from icdc_dataloader_spark.repos import load_repos_model, make_pipeline

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def test_session_oracle_sums_are_bigint():
    """DuckDB SUM(BIGINT) returns HUGEINT, which pandas renders float64 and
    breaks the driver's hash even when values match Spark (round-3's one
    red row).  The CASTs in SESSION_SQL must keep every column int64."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    pdf = con.execute(SESSION_SQL).df()
    for col in ("session_no", "total_cents", "n_events",
                "session_start_s", "session_end_s"):
        assert str(pdf[col].dtype) == "int64", (
            f"{col} is {pdf[col].dtype}; HUGEINT leak would hash-mismatch"
        )


def test_default_max_violations_matches_reference():
    # reference loader.py:27 DEFAULT_MAX_VIOLATIONS = 1000000; a lower
    # default silently truncates validation reports for users bringing
    # their existing configs
    assert DEFAULT_MAX_VIOLATIONS == 1_000_000


def test_file_seq_expr_is_flat_map_lookup(spark):
    """500 source files -> one create_map literal, not a 500-deep
    WHEN/OTHERWISE chain; values exact, unknown ordinals -> NULL."""
    per_file_seq = {i: 1000 + i * 3 for i in range(500)}
    df = spark.range(502).select(
        F.col("id").cast("int").alias("_file_ord")
    ).withColumn("_seq", file_seq_expr(per_file_seq))
    rows = {r["_file_ord"]: r["_seq"] for r in df.collect()}
    assert rows[0] == 1000 and rows[499] == 1000 + 499 * 3
    assert rows[500] is None and rows[501] is None  # out-of-map default
    # the analyzer tree must not nest per file: one CaseWhen per WHEN link
    # would show ~500 'CASE WHEN' occurrences
    plan = df._jdf.queryExecution().analyzed().toString()
    assert plan.count("CASE WHEN") == 0


def _write_tsv(path, header, rows):
    with open(path, "w") as fh:
        fh.write("\t".join(header) + "\n")
        for r in rows:
            fh.write("\t".join(r) + "\n")
    return str(path)


@pytest.fixture
def graph_dataset(tmp_path):
    owners = _write_tsv(
        tmp_path / "owners.txt",
        ["type", "owner_id", "owner_name"],
        [["repo_owner", "o1", "Alice"], ["repo_owner", "o2", "Bob"]],
    )
    files = _write_tsv(
        tmp_path / "files.txt",
        ["type", "file_key", "repo", "path", "commit", "lang",
         "owned_by$since", "repo_owner.owner_id"],
        [
            ["repo_file", "r1:a", "r1", "a", "c1", "python", "2020", "o1"],
            ["repo_file", "r1:b", "r1", "b", "c2", "go", "2021", "o1"],
            ["repo_file", "r2:a", "r2", "a", "c3", "rust", "2022", "o2"],
        ],
    )
    return owners, files


def test_delete_cascade_dataframe_seeds_match_list_path(
    spark, tmp_path, graph_dataset
):
    owners, files = graph_dataset
    results = {}
    for mode in ("list", "df"):
        gl = GraphLoader(
            spark, str(tmp_path / f"graph_{mode}"), load_repos_model()
        )
        gl.load_files([("repo_owner", owners), ("repo_file", files)])
        if mode == "list":
            seeds = ["o1"]
        else:
            # padded/blank ids exercise the trim+filter in the DF path
            seeds = spark.createDataFrame(
                [(" o1 ",), ("",), (None,)], ["owner_id"]
            )
        results[mode] = (
            gl.delete_cascade("repo_owner", seeds),
            gl.nodes("repo_owner").count(),
            gl.nodes("repo_file").count(),
            gl.edges().count(),
        )
    assert results["df"] == results["list"] == ((3, 2), 1, 1, 1)


def test_delete_cascade_large_seed_frame(spark, tmp_path, graph_dataset):
    """A 100k-row machine-generated delete manifest must flow through as a
    semi-join — an isin() over a 100k-literal Python list would explode the
    plan; the DataFrame path keeps it one distributed join."""
    owners, files = graph_dataset
    gl = GraphLoader(spark, str(tmp_path / "graph"), load_repos_model())
    gl.load_files([("repo_owner", owners), ("repo_file", files)])
    seeds = spark.range(100_000).select(
        F.concat(F.lit("no_such_"), F.col("id")).alias("owner_id")
    ).unionByName(spark.createDataFrame([("o2",)], ["owner_id"]))
    n_nodes, n_rels = gl.delete_cascade("repo_owner", seeds)
    assert (n_nodes, n_rels) == (2, 1)  # o2 + its one file + its edge
    assert gl.nodes("repo_owner").count() == 1


def _lagging_partition_binlog(spark, root, drain2_seq):
    """Two drains; the second carries a LAGGING partition's upsert at
    ``drain2_seq`` for the key drain 1 deleted at seq 101."""
    d1 = pd.DataFrame([
        dict(seq=1,   op="upsert", repo="rA", path="x", commit="c1",
             lang="python", content="v1", batch_id=0),
        dict(seq=101, op="upsert", repo="rB", path="y", commit="c2",
             lang="python", content="v2", batch_id=0),
        dict(seq=102, op="delete", repo="rA", path="x", commit=None,
             lang=None, content=None, batch_id=1),
        dict(seq=103, op="upsert", repo="rB", path="y", commit="c3",
             lang="python", content="v3", batch_id=1),
    ])
    d2 = pd.DataFrame([
        dict(seq=drain2_seq, op="upsert", repo="rA", path="x", commit="cL",
             lang="python", content="late", batch_id=2),
        dict(seq=104, op="upsert", repo="rB", path="y", commit="c4",
             lang="python", content="v4", batch_id=2),
    ])
    for name, pdf in (("d1", d1), ("d2", d2)):
        pdf = pdf.copy()
        pdf["ts"] = pd.Timestamp("2024-01-01").as_unit("us")
        spark.createDataFrame(pdf).write.partitionBy("batch_id").parquet(
            os.path.join(root, name)
        )
    return os.path.join(root, "d1"), os.path.join(root, "d2")


def test_gc_contract_lagging_partition(spark, tmp_path):
    """The ADVICE hazard, pinned as behavior: with late_horizon=0 the GC
    contract REQUIRES a globally-monotone seq, so a cross-drain event
    whose seq trails the applied max by 52 is out of contract — and with
    late_horizon=100 (covering the lag) the tombstone survives compaction
    and the deleted row stays deleted."""
    d1, d2 = _lagging_partition_binlog(
        spark, str(tmp_path / "binlog"), drain2_seq=50
    )
    pipe = make_pipeline(
        spark, str(tmp_path / "out"), n_buckets=1, strategy="mor",
        compact_every=1, late_horizon=100,
    )
    pipe.run(spark.read.parquet(d1))
    # in-loop compaction ran; the watermark (applied max 103 − horizon 100
    # = 3) must have retained the seq-102 tombstone
    raw = pipe.lake.read(spark)
    assert raw.filter("_op = 'delete'").count() == 1
    pipe.run(spark.read.parquet(d2))
    state = {
        (r["repo"], r["path"])
        for r in read_state(spark, pipe.lake).select("repo", "path").collect()
    }
    # the late seq-50 upsert loses LWW to the seq-102 tombstone: rA/x stays
    # deleted (a resurrect here would be the ADVICE bug)
    assert state == {("rB", "y")}


def test_gc_contract_in_contract_sequence_still_gcs(spark, tmp_path):
    """Same shape but the second drain's seq (150) respects the
    late_horizon=0 global-monotone contract: GC may (and does) drop the
    dead tombstone, and the final state is still exact."""
    d1, d2 = _lagging_partition_binlog(
        spark, str(tmp_path / "binlog"), drain2_seq=150
    )
    pipe = make_pipeline(
        spark, str(tmp_path / "out"), n_buckets=1, strategy="mor",
        compact_every=1, late_horizon=0,
    )
    pipe.run(spark.read.parquet(d1))
    pipe.run(spark.read.parquet(d2))
    raw = pipe.lake.read(spark)
    assert raw.filter("_op = 'delete'").count() == 0  # tombstone reclaimed
    state = {
        (r["repo"], r["path"]): r["commit"]
        for r in read_state(spark, pipe.lake)
        .select("repo", "path", "commit").collect()
    }
    assert state == {("rA", "x"): "cL", ("rB", "y"): "c4"}
