"""Randomized engine-vs-oracle parity including the nasty cases the fixed
generators avoid: duplicate (repo,path,seq) replays, equal-seq ties broken
by (commit, sha256(content)) — SURVEY §7.4's total order — keys colliding
across batches, deletes racing upserts at the same seq."""

import hashlib
import random

import pandas as pd
import pytest

from icdc_dataloader_spark import oracle
from icdc_dataloader_spark.plans.merge import read_state
from icdc_dataloader_spark.repos import make_pipeline


def _random_events(seed: int, n: int = 300) -> pd.DataFrame:
    rng = random.Random(seed)
    keys = [(f"r{i}", f"p{j}") for i in range(4) for j in range(3)]  # 12 keys
    rows = []
    for i in range(n):
        repo, path = rng.choice(keys)
        # seqs drawn from a SMALL range => frequent exact ties
        seq = rng.randrange(0, n // 4)
        op = rng.choices(["upsert", "delete"], weights=[0.8, 0.2])[0]
        commit = hashlib.sha1(f"{seed}:{i}:{seq}".encode()).hexdigest()[:8]
        content = None if op == "delete" else f"content-{seed}-{rng.randrange(5)}"
        rows.append(
            dict(
                seq=seq, op=op, repo=repo, path=path, commit=commit,
                lang=rng.choice(["python", "go", "rust"]), content=content,
                batch_id=rng.randrange(3),
            )
        )
    # exact duplicate replays of some rows (possibly in other batches)
    for _ in range(n // 10):
        dup = dict(rng.choice(rows))
        dup["batch_id"] = rng.randrange(3)
        rows.append(dup)
    df = pd.DataFrame(rows)
    df["ts"] = pd.Timestamp("2024-01-01").as_unit("us")
    return df


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
@pytest.mark.parametrize("strategy", ["cow", "mor"])
def test_fuzz_parity(spark, tmp_path, seed, strategy):
    pdf = _random_events(seed)
    p = str(tmp_path / f"ev{seed}{strategy}.parquet")
    pdf.to_parquet(p, index=False)
    pipe = make_pipeline(
        spark, str(tmp_path / f"out{seed}{strategy}"), n_buckets=4,
        strategy=strategy, compact_every=2,
    )
    pipe.run(spark.read.parquet(p))
    got = {
        (r["repo"], r["path"]): (r["commit"], r["content_sha256"])
        for r in read_state(spark, pipe.lake).collect()
    }
    out = oracle.replay(pdf.to_dict("records"))
    exp = {
        k: (r["commit"], r["content_sha256"])
        for k, r in out["state"].items()
        if r["_op"] != "delete"
    }
    assert got == exp, f"seed={seed} strategy={strategy}"
