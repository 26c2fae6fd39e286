"""Text analysis, dedup family, ANN, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from icdc_dataloader_spark.functions import text as TXT
from icdc_dataloader_spark.operators import dedup, multimodal, similarity


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, "   "), (4, "a   b")],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            TXT.token_count(F.col("text")).alias("n"),
            TXT.stopword_ratio(F.col("text")).alias("sw"),
            TXT.quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert rows[1]["n"] == 4 and rows[2]["n"] == 0 and rows[3]["n"] == 0
    assert rows[4]["n"] == 2
    assert rows[1]["sw"] == pytest.approx(0.25)  # 'the' of 4
    assert 0.0 <= rows[1]["q"] <= 1.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is a friend of the house"),
            (2, "der hund und die katze ist das haus"),
            (3, "le chat et les chiens la maison des amis"),
            (4, "xyzzy plugh qwert"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang"] for r in df.select("id", TXT.lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "und"


def test_doc_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "id long, text string",
    )
    got = {r["id"]: r["fp"] for r in df.select("id", TXT.doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[1] == got[3] and got[1] != got[2]


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again every single day"
    near = base.replace("lazy", "sleepy")
    other = "completely different words about spark shuffles and partitions at scale"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    # 2 rows/band => band-collision prob j^2: catches moderate similarity
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_dedup(
            df, num_hashes=32, bands=16, jaccard_threshold=0.3
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_similarity(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    near = base.replace("dog", "cat")
    other = "totally unrelated content about query optimizers and broadcast joins"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    got = {r["id"]: r["simhash"] for r in dedup.simhash(df).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(got[1], got[2]) < hamming(got[1], got[3])


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    # 3-grams: {abc, bcd} vs {abc, bce}: jaccard = 1/3
    rows = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard"] == pytest.approx(1 / 3)


def test_cosine_topk_exact(spark):
    vecs = [
        (0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0]), (3, [0.9, 0.05]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = similarity.cosine_topk(
        df.filter("vec_id > 0"), df.filter("vec_id = 0"), k=2
    ).collect()
    ranked = [(r["rank"], r["neighbor_id"]) for r in out]
    assert (1, 3) in ranked or (1, 1) in ranked  # 3 and 1 nearly parallel to q
    assert all(r["neighbor_id"] != 2 or r["rank"] > 2 for r in out)


def test_lsh_recall_vs_exact(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    c = emb.filter(F.col("vec_id") >= 5)
    exact = similarity.cosine_topk(c, q, k=5).collect()
    approx = similarity.lsh_topk(c, q, dim=64, k=5, n_tables=6, n_planes=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"LSH recall too low: {recall}"


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"\x10fakepng\x20"), "image/png"),
        (2, "video", bytearray(b"\x05fakemp4data\x30"), "video/mp4"),
    ]
    df = spark.createDataFrame(
        [(i, k, bytes(p), m, len(p)) for i, k, p, m in rows],
        multimodal.MEDIA_SCHEMA,
    )
    meta = multimodal.attach_metadata(df)
    got = {r["media_id"]: r for r in meta.collect()}
    assert got[1]["n_bytes"] == 9 and len(got[1]["sha256"]) == 64

    feats = multimodal.extract_features(df, decoder=multimodal.fake_decoder)
    out = {r["media_id"]: r for r in feats.collect()}
    assert out[1]["width"] == 16 + 0x10 and out[1]["n_frames"] == 1
    assert out[2]["n_frames"] > 1 and len(out[2]["feature"]) == 4

    with pytest.raises(Exception):
        multimodal.extract_features(df, decoder=None).collect()
