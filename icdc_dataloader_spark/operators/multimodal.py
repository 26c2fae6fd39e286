"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a metadata struct
(the reference's analogue: file manifests with md5/size/format,
file_loader.py:233-341).  Decode/resize/frame-sample run as Arrow-batched
pandas functions over ``mapInPandas`` so each task processes whole record
batches; the decode libraries (PIL/av/librosa) are NOT in this container,
so the codec step is stubbed behind ``decoder=`` — the Spark-side plumbing
(schema, batch iteration, partitioning, metadata derivation) is real and
tested with a deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, n_bytes long"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, width int,"
    " height int, n_frames int, feature array<float>"
)


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive typed metadata natively (no decode needed): size + sha256."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "sha256", F.sha2(F.col(payload_col), 256)
    )


def fake_decoder(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for PIL/av decode: derives 'dimensions' and a
    4-float 'feature' from the bytes themselves.  Replace with a real codec
    on a cluster (same signature)."""
    if payload is None:
        raise ValueError("empty payload")
    n = len(payload)
    w = 16 + (payload[0] if n else 0)
    h = 16 + (payload[-1] if n else 0)
    frames = 1 if kind == "image" else 1 + n % 30
    feat = [float(payload[i % n]) / 255.0 for i in range(4)] if n else [0.0] * 4
    return {"width": w, "height": h, "n_frames": frames, "feature": feat}


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], dict] | None = None,
    batch_schema: str = FEATURE_SCHEMA,
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, not per-row).

    ``decoder=None`` raises NotImplementedError at execution time — the
    container has no codec libraries; pass :func:`fake_decoder` in tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "no media codec available in this environment; "
                    "pass decoder= (e.g. PIL/av backed) or fake_decoder for tests"
                )
            out = {
                "media_id": [], "kind": [], "n_bytes": [], "sha256": [],
                "width": [], "height": [], "n_frames": [], "feature": [],
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                d = decoder(bytes(payload), kind)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["sha256"].append(hashlib.sha256(bytes(payload)).hexdigest())
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["n_frames"].append(d["n_frames"])
                out["feature"].append(d["feature"])
            yield pd.DataFrame(out)

    return df.select("media_id", "kind", "payload").mapInPandas(run, batch_schema)
