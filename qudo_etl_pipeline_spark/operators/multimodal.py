"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns plus a typed metadata struct;
decode / feature-extraction / resize run as Arrow-batched ``mapInPandas``
kernels so the Spark-side contract (schema, batching, partitioning) is
real and tested even though the actual codecs are not installed in this
environment. The decode step is STUBBED: with ``decoder="fake"`` a
deterministic byte-statistics feature is produced (useful for testing the
plumbing end-to-end); with ``decoder="real"`` the kernel raises
``NotImplementedError`` unless the optional imaging/audio libraries are
importable.

Scale design (100 TB of media):
- payloads never leave the executor: mapInPandas streams Arrow batches,
  features are small fixed-size vectors;
- frame sampling is a pure column expression (sequence + explode), so
  Catalyst can pipeline it before the decode kernel;
- partition sizing: media rows are large — callers should set
  spark.sql.files.maxPartitionBytes down (e.g. 32 MB) so a batch of
  payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

N_FEATURES = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _have_real_decoders() -> bool:
    try:  # pragma: no cover - codecs absent in this environment
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector.

    Byte-level statistics (mean/std/quantiles of the raw payload) — NOT a
    real decode, but a stable, content-dependent vector that exercises
    the exact schema/batch path a real extractor would use.
    """
    if payload is None or len(payload) == 0:
        return np.zeros(N_FEATURES, dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    qs = np.quantile(b, [0.25, 0.5, 0.75])
    return np.array(
        [
            b.mean(),
            b.std(),
            b.min(),
            b.max(),
            qs[0],
            qs[1],
            qs[2],
            float(len(b) % 251),
        ],
        dtype=np.float32,
    )


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """(media_id, kind, n_bytes, features) via an Arrow mapInPandas kernel."""
    if decoder == "real" and not _have_real_decoders():
        raise NotImplementedError(
            "real media decoding requires imaging/audio libraries that are "
            "not installed; use decoder='fake' for the deterministic stub"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx, frame_ts_ms) rows for video payloads.

    Pure column expression (sequence + explode): the sampling plan is
    computed from metadata without touching payload bytes, so Catalyst
    prunes the binary column entirely from this branch.
    """
    n = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias(
                "frame_idx"
            ),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def resize_meta(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plan: update metadata (payload transform stubbed).

    A real implementation would re-encode payload in the same kernel
    shape as extract_features; here only the typed metadata is rewritten
    so downstream schema contracts can be exercised.
    """
    new_meta = F.struct(
        F.col("meta.format").alias("format"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    return df.withColumn("meta", new_meta)
