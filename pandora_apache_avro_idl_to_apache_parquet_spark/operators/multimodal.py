"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` cells with a metadata
struct — the same opaque-bytes-with-schema contract the reference uses for
``BYTES``/``FIXED`` Avro fields (``/root/reference/.../Parquet.fs:561-569``,
``pj_sha`` payload hashing at ``Parquet.fs:455-457``). The Spark-side plumbing
(schema, partitioning, Arrow batch shape, UDF signatures) is real and tested;
the actual media decoding is STUBBED — the container has no image/audio
libraries — behind ``decode_media_stub`` (raises ``NotImplementedError``) and
``fake_features`` (deterministic md5-derived vector standing in for a real
extractor so downstream plumbing is testable end-to-end).

Scale notes: payload bytes ride one Arrow batch column; ``mapInPandas``
streams batches so executor memory holds one batch of blobs, never a
partition's worth. Feature extraction is embarrassingly parallel — no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("sha", T.StringType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: stage the documents table as a media table (text bytes as the
    opaque payload) so the multimodal plumbing is exercised on real data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
            F.sha2(F.col("text").cast("binary"), 256).alias("sha"),
        ).alias("meta"),
    )


def decode_media_stub(payload: bytes, media_type: str):
    """Real media decode (PIL/librosa/av) — unavailable in this container."""
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires image/audio libraries "
        "not present in this environment; wire a real decoder here"
    )


def _fake_feature_block(payloads: pd.Series) -> list[np.ndarray]:
    """Deterministic stand-in extractor: FEATURE_DIM floats from the payload
    sha256 — byte i of the digest scaled to [0,1). Vectorized per batch."""
    out = []
    for b in payloads:
        d = hashlib.sha256(bytes(b)).digest()
        out.append(np.frombuffer(d[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 256.0)
    return out


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The Arrow batch shape is the real contract being tested: each batch is a
    pandas DataFrame whose ``payload`` column holds raw bytes; a real extractor
    would decode/resize/frame-sample here (see ``decode_media_stub``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_feature_block(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "sha": [m["sha"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def media_feature_summary(docs: DataFrame) -> DataFrame:
    """End-to-end plumbing query: documents → media staging → mapInPandas
    feature extraction → scalar projection (SQL-oracle-able because the fake
    features are pure functions of sha256, which DuckDB can recompute)."""
    feats = extract_features(documents_as_media(docs))
    return feats.select(
        "media_id",
        "n_bytes",
        "sha",
        F.round(F.expr("aggregate(features, cast(0 as double), (a, x) -> a + x)"), 4).alias(
            "feat_sum"
        ),
    ).orderBy("media_id")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("off", T.LongType(), False),
        T.StructField("frame_text", T.StringType(), False),
    ]
)


def frame_sample(media: DataFrame, n_frames: int = 4,
                 width: int = 32) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads: ``n_frames`` evenly
    spaced fixed-width byte windows per payload, one output row per frame.

    The ``mapInPandas`` batch shape, offset math, and per-frame row fan-out
    are the real contract a video pipeline needs; the decode itself is the
    deterministic fake (the raw byte window — a real decoder would seek and
    decode at these offsets, see :func:`decode_media_stub`), so the SQL
    oracle reproduces frames exactly with ``substr``. Offsets:
    ``i * max(n_bytes - width, 0) // max(n_frames - 1, 1)``.

    Scale: pure map-side fan-out (no shuffle); output rows = n_frames per
    payload regardless of payload size, so a 4-frame sample of a 1 GB blob
    ships 4·width bytes downstream, not the blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, offs, texts = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b)
                stride = max(len(b) - width, 0) // max(n_frames - 1, 1)
                for i in range(n_frames):
                    off = i * stride
                    mids.append(mid)
                    idxs.append(i)
                    offs.append(off)
                    texts.append(b[off:off + width].decode("utf-8", "replace"))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "off": pd.Series(offs, dtype="int64"),
                    "frame_text": pd.Series(texts, dtype="object"),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
