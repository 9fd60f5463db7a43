"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as parquet ``binary``
columns next to typed metadata, and runs decode / feature-extract /
resize / frame-sample as Arrow-batched Python stages (``mapInPandas``).
This module implements that plumbing for real — schema, partitioning,
UDF signatures, batch iteration — while the codec step itself is
STUBBED: the image/audio libraries are not in this container, so
``decode_media`` raises ``NotImplementedError`` and tests exercise the
pipeline through :func:`fake_decode`, a deterministic pure-bytes stand-in.

Swap-in point for production: replace ``fake_decode`` with a real
decoder (PIL/ffmpeg) inside the same ``mapInPandas`` functions — the
Spark-side plan is unchanged.

Scale notes:
- ``mapInPandas`` streams Arrow record batches; peak executor memory is
  one batch of payloads, not one partition — cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are MBs.
- All stages are narrow (no shuffle): media rows never co-locate by key;
  only the tiny per-media feature rows ever shuffle downstream.
- Payload columns are pruned unless referenced: metadata-only queries
  (``media_stats``) read just the meta struct from parquet.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy_proxy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def decode_media(payload: bytes, kind: str, codec: str) -> Any:
    """Real codec decode — intentionally stubbed in this environment.

    Production: dispatch on (kind, codec) to PIL / soundfile / ffmpeg
    inside the mapInPandas worker. The container has none of those."""
    raise NotImplementedError(
        f"no codec libraries in this environment (kind={kind}, codec={codec}); "
        "tests use fake_decode"
    )


def fake_decode(payload: bytes, n_dims: int = 8) -> list[float]:
    """Deterministic stand-in for decode+embed: sha256 of the payload
    chopped into *n_dims* floats in [0, 1). Pure bytes → reproducible
    across runs, workers, and engines."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / float(1 << 32)
        for i in range(n_dims)
    ]


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (test input;
    payload = sha256-stretched pseudo-bytes, sized per kind)."""
    rows = []
    for i in range(n):
        kind = MEDIA_KINDS[i % len(MEDIA_KINDS)]
        blob = b""
        state = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        size = 256 + (i % 7) * 128
        while len(blob) < size:
            state = hashlib.sha256(state).digest()
            blob += state
        meta = {
            "width": 64 + i % 4 * 32 if kind == "image" else None,
            "height": 64 + i % 3 * 32 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + i * 10 if kind in ("audio", "video") else None,
            "codec": {"image": "png", "audio": "wav", "video": "h264"}[kind],
        }
        rows.append((i, kind, blob[:size], meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, n_dims: int = 8) -> DataFrame:
    """Per-media feature extraction via Arrow-batched ``mapInPandas``.

    Emits cheap byte statistics plus the fake embedding; in production
    the body calls the real decoder, the plan stays identical."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "byte_mean": payloads.map(
                        lambda b: sum(b) / len(b) if len(b) else 0.0
                    ),
                    # distinct-byte ratio: crude entropy proxy without
                    # numpy histograms per row
                    "byte_entropy_proxy": payloads.map(
                        lambda b: len(set(b)) / 256.0
                    ),
                    "feature": payloads.map(lambda b: fake_decode(b, n_dims)),
                }
            )
            yield out

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 128, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads: emit every *every_n_bytes*
    chunk as a pseudo-frame (production: ffmpeg keyframe extraction in
    the same mapInPandas body). One input row fans out to ≤max_frames
    output rows — mapInPandas handles 1→N natively."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                for fi in range(max_frames):
                    start = fi * every_n_bytes
                    if start >= len(payload):
                        break
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(payload[start : start + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.mapInPandas(_batches, FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing: passes payloads through the Arrow path and
    updates the metadata struct; the pixel transform itself would live
    where ``decode_media`` is called. Kept JVM-side except the payload
    identity map — demonstrates meta-struct rewrite without shuffles."""
    return media.withColumn(
        "meta",
        F.when(
            F.col("kind") == "image",
            F.struct(
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col("meta.sample_rate").alias("sample_rate"),
                F.col("meta.duration_ms").alias("duration_ms"),
                F.col("meta.codec").alias("codec"),
            ),
        ).otherwise(F.col("meta")),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind rollup over metadata + payload length. ``length()`` on a
    binary column reads the value but keeps the agg JVM-side; for a
    strictly metadata-only scan drop ``avg_bytes`` and the payload
    column is pruned from the parquet read."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.length("payload")).alias("avg_bytes"),
            F.avg("meta.duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
