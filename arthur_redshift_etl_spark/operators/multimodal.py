"""Multimodal columns: opaque binary payloads with typed metadata.

Image/audio/video are ``binary`` columns plus a metadata struct
(modality, format, width/height/duration, byte size).  Decode and feature
extraction run as Arrow-batched ``mapInPandas`` stages — the Spark-side
plumbing (schema, batching, partitioning) is real; the actual media codecs
are STUBBED (this environment has no image/audio libraries): decode raises
``NotImplementedError`` unless the deterministic fake decoder is requested.

Scale notes: payloads never pass through the driver; ``mapInPandas``
streams Arrow batches through each executor, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch × mean payload size``.
Keep payloads ≤ a few MB per row, or store pointers (file paths) instead of
bytes — both shapes are supported (``payload`` may be NULL with a
``uri`` set).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("uri", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),  # image|audio|video
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_metadata(df: DataFrame, payload_col: str = "payload",
                    modality: str = "image", fmt: str = "raw") -> DataFrame:
    """Fill the metadata struct from the payload itself (size et al.)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_decode_features(payload: bytes) -> list:
    """Deterministic stand-in for a real decoder: md5-seeded pseudo-features.

    Replaces (until real codecs are available) the decode → resize →
    embed pipeline with a reproducible function of the bytes, so the
    Spark-side plumbing is testable end-to-end.
    """
    digest = hashlib.md5(payload or b"").digest()
    return [
        ((digest[i % 16] << 8 | digest[(i + 1) % 16]) % 1000) / 1000.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    use_fake_decoder: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``use_fake_decoder=False`` raises NotImplementedError at execution time
    — the real decode step needs media libraries not present here.  The
    mapInPandas structure (batch iteration, schema contract, partition
    preservation) is exactly what a real decoder plugs into.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries; "
                    "pass use_fake_decoder=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "feature": [
                        _fake_decode_features(p if p is not None else b"")
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows to decode.

    Pure metadata arithmetic (no decode): one row per sampled timestamp,
    derived from ``meta.duration_ms`` with ``sequence`` — stays JVM-side.
    """
    return (
        df.filter(F.col("meta.modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


PAYLOAD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)


def payload_stats(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Arrow-batched byte-level stats over binary payloads.

    The oracle-checkable slice of the decode pipeline: bytes stream through
    the same ``mapInPandas`` contract as ``extract_features`` (binary Arrow
    batches per partition, no driver round-trip), computing per-payload
    length + digest — deterministic, so it verifies the plumbing that the
    stubbed media codecs plug into.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = [p if p is not None else b"" for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) for p in payloads],
                    "payload_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, PAYLOAD_STATS_SCHEMA)
