"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns plus a typed metadata struct;
decode / feature-extraction / resize run as Arrow-batched ``mapInPandas``
kernels so the Spark-side contract (schema, batching, partitioning) is
real and tested even though the actual codecs are not installed in this
environment. Decode tiers: ``decoder="png"`` is a REAL image decode —
the stdlib-only baseline-PNG codec in operators/media_codecs.py (zlib + struct)
needs no imaging library; ``decoder="fake"`` is a deterministic
byte-statistics stub for arbitrary payloads; ``decoder="real"`` (full
codec suite) raises ``NotImplementedError`` unless the optional
imaging/audio libraries are importable.

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


def _png_features(payload: bytes) -> np.ndarray:
    """REAL image features via the pure-stdlib PNG codec
    (operators/media_codecs.py): decode to pixels, emit
    [width, height, channels, pixel_sum, pixel_min, pixel_max,
    pixel_mean, n_bytes % 251] — integer-derived statistics a SQL
    oracle can compute in closed form from a known generator pattern.
    """
    from qudo_etl_pipeline_spark.operators.media_codecs import png_decode

    if payload is None or len(payload) == 0:
        return np.zeros(N_FEATURES, dtype=np.float32)
    px = png_decode(bytes(payload))
    h, w, ch = px.shape
    return np.array(
        [
            w,
            h,
            ch,
            float(px.sum(dtype=np.int64)),
            float(px.min()),
            float(px.max()),
            float(px.sum(dtype=np.int64)) / px.size,
            float(len(payload) % 251),
        ],
        dtype=np.float32,
    )


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """(media_id, kind, n_bytes, features) via an Arrow mapInPandas kernel.

    ``decoder``: "fake" — deterministic byte statistics (any payload);
    "png" / "wav" — REAL decode through the stdlib-only codecs
    (operators/media_codecs.py); "real" — full codec suite, requires
    imaging/audio libraries.
    """
    if decoder == "real":
        # the full codec suite is not implemented in this environment
        # even when PIL happens to be importable — refuse loudly rather
        # than silently returning stub features
        raise NotImplementedError(
            "decoder='real' (full codec suite) is not available; use "
            "decoder='png' / 'wav' for the stdlib codecs or "
            "decoder='fake' for the deterministic stub"
        )
    try:
        featurize = {
            "png": _png_features,
            "wav": _wav_features,
            "fake": _fake_features,
        }[decoder]
    except KeyError:
        raise ValueError(f"unknown decoder {decoder!r}") from None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [featurize(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                }
            )

    # FEATURE_SCHEMA pins media_id non-nullable (features must join
    # back to their media row), so an id-less payload is dropped HERE,
    # explicitly — letting it reach the kernel puts a null into a
    # non-nullable Arrow vector, which surfaces as an opaque
    # "Value at index is null" executor crash (r11 NULL-salt sweep)
    return df.filter(F.col("media_id").isNotNull()).mapInPandas(
        kernel, FEATURE_SCHEMA
    )


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


def synthetic_png_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic PNG payloads for pipeline tests/benchmarks.

    Image ``i`` is (4 + i%5) x (4 + i%7) RGB with
    pixel(y, x, c) = (i*7 + x*3 + y*5 + c*11) % 256 — a closed form a
    SQL oracle can aggregate without decoding, so the REAL encode->
    decode path is verifiable end-to-end. Encoding runs executor-side
    in the same Arrow kernel shape as extraction.
    """
    from qudo_etl_pipeline_spark.operators.media_codecs import png_encode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 4 + i % 5, 4 + i % 7
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((i * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)
                payloads.append(png_encode(px))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": ["image"] * len(pdf),
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    return ids.select(F.col(id_col)).mapInPandas(kernel, MEDIA_SCHEMA)


def _wav_features(payload: bytes) -> np.ndarray:
    """REAL audio features via the stdlib WAV codec
    (operators/media_codecs.py): [sample_rate, n_samples, channels,
    sample_sum, sample_min, sample_max, sample_mean, n_bytes % 251]."""
    from qudo_etl_pipeline_spark.operators.media_codecs import wav_decode

    if payload is None or len(payload) == 0:
        return np.zeros(N_FEATURES, dtype=np.float32)
    rate, samples = wav_decode(bytes(payload))
    n, ch = samples.shape
    total = float(samples.sum(dtype=np.int64))
    return np.array(
        [
            rate,
            n,
            ch,
            total,
            float(samples.min()),
            float(samples.max()),
            total / samples.size,
            float(len(payload) % 251),
        ],
        dtype=np.float32,
    )


def synthetic_wav_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic PCM16 WAV payloads (the audio twin of
    synthetic_png_media): clip ``i`` is mono, 8000 + i%5 Hz,
    50 + i%17 samples, s(n) = ((i*13 + 7n) % 201) - 100 — closed-form
    aggregable by a SQL oracle without decoding."""
    from qudo_etl_pipeline_spark.operators.media_codecs import wav_encode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                n = 50 + i % 17
                s = ((i * 13 + 7 * np.arange(n)) % 201 - 100).astype(np.int16)
                payloads.append(wav_encode(s, sample_rate=8000 + i % 5))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": ["audio"] * len(pdf),
                    "payload": payloads,
                    "meta": [None] * len(pdf),
                }
            )

    return ids.select(F.col(id_col)).mapInPandas(kernel, MEDIA_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize: decode PNG payload -> nearest-neighbor
    resample -> re-encode, in one Arrow ``mapInPandas`` kernel.

    Nearest-neighbor index map: src_x = floor(x * W / width),
    src_y = floor(y * H / height) — integer arithmetic, so resized
    pixel values are closed-form predictable from a known generator
    pattern (the oracle device). Non-PNG payloads pass through null.
    Updates the meta struct to the new dimensions.
    """
    from qudo_etl_pipeline_spark.operators.media_codecs import (
        png_decode,
        png_encode,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for p in pdf["payload"]:
                try:
                    px = png_decode(bytes(p))
                except Exception:
                    # a corrupt payload behind a valid PNG signature can
                    # surface struct.error / zlib.error / IndexError from
                    # the decoder, not just the documented ValueError —
                    # any undecodable payload passes through null rather
                    # than failing the whole Spark job
                    payloads.append(None)
                    metas.append(None)
                    continue
                h0, w0 = px.shape[:2]
                ys = (np.arange(height) * h0) // height
                xs = (np.arange(width) * w0) // width
                out = px[ys][:, xs]
                payloads.append(png_encode(out))
                metas.append(
                    {
                        "format": "png",
                        "width": width,
                        "height": height,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.mapInPandas(kernel, MEDIA_SCHEMA)
