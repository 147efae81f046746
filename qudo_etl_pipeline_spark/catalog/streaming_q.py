"""Streaming catalog entries over the events table.

``streaming_events_hourly`` runs a REAL Structured Streaming query
(parquet file source -> tumbling window aggregate -> memory sink in
complete mode, drained synchronously) whose final answer equals the batch
oracle — demonstrating the batch/streaming unification Spark gives the
engine. Sessionization is provided in batch form (SQL-oracle-checked);
its stateful-streaming twin lives in qudo_etl_pipeline_spark/streaming/.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import load_events, register


def _file_stream(
    spark: SparkSession, sf_dir: str, name: str, schema
) -> DataFrame:
    """Streaming file source for ``{sf_dir}/{name}.parquet`` under BOTH
    on-disk layouts: the driver-generated SFs are single parquet FILES
    (the file source wants a directory, so list the parent with a
    filename glob-filter), while gen_sf scale dirs are Spark-style
    DIRECTORIES of part files (point the source at the directory
    itself — a glob-filter for the logical name would match nothing
    and silently stream 0 rows, which is how the sf1 sweep caught
    this)."""
    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        return spark.readStream.schema(schema).parquet(path)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming events source with ``ts`` normalized to plain TIMESTAMP
    (same three-encodings story as catalog.load_events)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _file_stream(spark, sf_dir, "events", schema)
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


_HOURLY_ORACLE = """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""


@register(
    "streaming_events_hourly",
    oracle=_HOURLY_ORACLE,
    survey_ids=["S1", "A4", "A5"],
    description="Structured Streaming tumbling-window agg (complete mode, memory sink)",
)
def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
    )
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "streaming_hourly_watermark",
    oracle="""
    WITH agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS hour_start, event_type, n
    FROM agg
    WHERE epoch_us(win_start) + 3600000000
          <= (SELECT MAX(epoch_us(ts)) FROM events) - 3600000000
    """,
    survey_ids=["S1", "A4"],
    description="Watermarked append-mode streaming agg: only closed windows emit",
)
def streaming_hourly_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data handling: a 1-hour watermark bounds the aggregation state
    and append mode emits a window only once the watermark passes its end
    (window.end <= max event time - delay). Open windows are withheld —
    the exact contract a continuous pipeline relies on to produce
    finalized, immutable hourly partitions. The drained availableNow run
    makes that finalization set deterministic and oracle-checkable.
    """
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n",
    )


@register(
    "session_window_agg",
    oracle="""
    WITH ordered AS (
      -- ts IS NOT NULL mirrors F.session_window, which generates no
      -- session for a NULL timestamp; NULLS LAST pins the event_id
      -- tie-break identically on both engines (r11 NULL-salt parity)
      SELECT user_id, ts,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id NULLS LAST) AS prev_us,
             event_id
      FROM events WHERE ts IS NOT NULL
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_us IS NULL
                       OR epoch_us(ts) - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, ts, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id NULLS LAST
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(make_timestamp(MIN(epoch_us(ts))), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    survey_ids=["W1"],
    description="Built-in session_window gap sessionization (batch/stream-agnostic)",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.streaming.sessions import session_window_counts

    return session_window_counts(load_events(spark, sf_dir), gap="30 minutes")


@register(
    "user_sessions",
    oracle="""
    WITH ordered AS (
      -- an event without a timestamp is not sessionizable (and the
      -- event_id tie-break is pinned NULLS LAST on both engines)
      SELECT user_id, ts,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id NULLS LAST) AS prev_us,
             event_id
      FROM events WHERE ts IS NOT NULL
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_us IS NULL
                       OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id NULLS LAST
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    survey_ids=["W1", "A4"],
    description="Sessionization: 30-min-gap session ids via lag + running sum",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # an event without a timestamp is not sessionizable; the event_id
    # tie-break is pinned NULLS LAST to match the oracle (Spark's bare
    # asc() is NULLS FIRST) — r11 NULL-salt parity
    e = load_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        "ts", F.asc_nulls_last("event_id")
    )
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy(
        "user_id", F.col("session_id").cast("bigint").alias("session_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "streaming_attribution_join",
    oracle="""
    SELECT p.event_id AS trigger_id, c.event_id AS touch_id, p.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us, p.value
    FROM events p JOIN events c ON p.user_id = c.user_id
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
    """,
    survey_ids=["J1", "S1"],
    description="Watermarked stream-stream interval join: purchases "
    "attributed to same-user clicks within 10 minutes (append mode, "
    "memory sink, drained; equals the batch interval self-join)",
)
def streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.streaming.sessions import attribution_join

    purchases = _events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    clicks = _events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    pairs = attribution_join(purchases, clicks, horizon="10 minutes")
    name = f"attr_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_DRIFT_SPLIT = "2024-01-16 00:00:00"
_DRIFT_BINS = 32


def _psi_stream_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    w = f"{float(_DRIFT_BINS)!r}"
    bucket = (
        f"CAST(CASE WHEN (hi - lo) / {w} > 0 THEN "
        f"GREATEST(0, LEAST({_DRIFT_BINS - 1}, "
        f"FLOOR((v - lo) / ((hi - lo) / {w})))) ELSE 0 END AS BIGINT)"
    )
    floor = "(CAST(100 AS DOUBLE) / 1000000.0)"
    pa = f"GREATEST(CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE), {floor})"
    pb = f"GREATEST(CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE), {floor})"
    return f"""
    WITH ref_raw AS (
      SELECT CAST(value AS DOUBLE) AS v FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT}' AND value IS NOT NULL
    ),
    cur_raw AS (
      SELECT CAST(value AS DOUBLE) AS v FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT}' AND value IS NOT NULL
    ),
    rng AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM ref_raw),
    refb AS (
      SELECT {bucket} AS b, CAST(COUNT(*) AS BIGINT) AS ca
      FROM ref_raw CROSS JOIN rng GROUP BY 1
    ),
    curb AS (
      SELECT {bucket} AS b, CAST(COUNT(*) AS BIGINT) AS cb
      FROM cur_raw CROSS JOIN rng GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(refb.b, curb.b) AS b,
             COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
      FROM refb FULL OUTER JOIN curb ON refb.b = curb.b
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b,
             CAST(COUNT(*) AS BIGINT) AS n_bins_used
      FROM j
    ),
    terms AS (
      SELECT n_a, n_b, n_bins_used,
             CAST(({pa} - {pb}) * ln({pa} / {pb}) AS DECIMAL(38,12))
               AS term
      FROM j CROSS JOIN tot
    )
    SELECT n_a, n_b, n_bins_used,
           {ref_round_sql("CAST(SUM(term) AS DOUBLE)", 6)} AS psi6
    FROM terms
    WHERE n_a > 0 AND n_b > 0
    GROUP BY n_a, n_b, n_bins_used
    """


@register(
    "streaming_psi_drift",
    oracle=_psi_stream_oracle(),
    survey_ids=["A4", "A8"],
    description="Streaming feature-drift monitor: the CURRENT-side "
    "histogram is a REAL Structured Streaming aggregate (file source "
    "-> clamped equi-width bucket counts in complete mode, drained "
    "with availableNow) over post-split events, binned on the "
    "REFERENCE period's min/max (the fixed-training-bins convention); "
    "psi_from_binned then composes it with the batch reference "
    "histogram through the exact psi_drift arithmetic - the "
    "batch/streaming unification applied to model monitoring",
)
def streaming_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.operators.analytics import (
        psi_from_binned,
    )

    ref = (
        load_events(spark, sf_dir)
        .filter(
            (F.col("ts") < _DRIFT_SPLIT) & F.col("value").isNotNull()
        )
        .select(F.col("value").cast("double").alias("v"))
    )
    lo, hi = ref.agg(F.min("v"), F.max("v")).collect()[0]
    width = (hi - lo) / float(_DRIFT_BINS)

    def bucket(col):
        if width > 0:
            return F.greatest(
                F.lit(0),
                F.least(
                    F.lit(_DRIFT_BINS - 1),
                    F.floor((col - F.lit(lo)) / F.lit(width)),
                ),
            ).cast("bigint")
        return F.lit(0).cast("bigint")

    ref_counts = ref.groupBy(bucket(F.col("v")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stream = _events_stream(spark, sf_dir).filter(
        (F.col("ts") >= _DRIFT_SPLIT) & F.col("value").isNotNull()
    )
    cur = stream.groupBy(
        bucket(F.col("value").cast("double")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    name = f"psidrift_{uuid.uuid4().hex[:8]}"
    q = (
        cur.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return psi_from_binned(ref_counts, spark.table(name))


def _lsh_dedup_oracle() -> str:
    # mirrors of dedup.minhash_signatures / lsh_bands live in
    # catalog.datapipe; a single availableNow drain processes each
    # (band, bucket) group in ascending doc_id order, so the streaming
    # first-arrival verdicts equal this batch min-per-bucket SQL
    from qudo_etl_pipeline_spark.catalog.datapipe import (
        _dh_raw,
        _mh_base_cte,
        _mh_sig,
    )

    return f"""
    WITH base AS ({_mh_base_cte()}),
    sig AS (
      SELECT doc_id,
             {_mh_sig(0)} AS mh0, {_mh_sig(1)} AS mh1,
             {_mh_sig(2)} AS mh2, {_mh_sig(3)} AS mh3
      FROM base
    ), bands AS (
      SELECT doc_id, 0::BIGINT AS band,
             {_dh_raw("mh0::VARCHAR || '_' || mh1::VARCHAR")} AS bucket FROM sig
      UNION ALL
      SELECT doc_id, 1::BIGINT AS band,
             {_dh_raw("mh2::VARCHAR || '_' || mh3::VARCHAR")} AS bucket FROM sig
    ), verd AS (
      SELECT doc_id,
             CASE WHEN doc_id > MIN(doc_id) OVER (PARTITION BY band, bucket)
                  THEN 1 ELSE 0 END AS dup
      FROM bands
      WHERE doc_id IS NOT NULL AND bucket IS NOT NULL
    )
    SELECT doc_id, CAST(MAX(dup) AS BIGINT) AS is_dup
    FROM verd GROUP BY doc_id ORDER BY doc_id
    """


@register(
    "streaming_lsh_dedup",
    oracle=_lsh_dedup_oracle(),
    survey_ids=["P7"],
    description="Streaming NEAR-dup gating: a REAL stateful streaming "
    "query (documents file source -> stateless minhash+banding -> "
    "applyInPandasWithState keyed by (band, bucket), first-arrival-"
    "wins, 8 bytes of state per distinct bucket regardless of bucket "
    "population) drained with availableNow; the per-doc OR-reduce over "
    "band verdicts then matches the batch min-per-bucket SQL exactly - "
    "the continuous-ingestion twin of lsh_candidate_pairs",
)
def streaming_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.operators import dedup as D
    from qudo_etl_pipeline_spark.streaming.sessions import (
        lsh_band_verdicts_stream,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    docs = _file_stream(spark, sf_dir, "documents", schema)
    sigs = D.minhash_signatures(docs, n_hashes=4)
    bands = D.lsh_bands(sigs, n_hashes=4, band_size=2)
    name = f"lshdedup_{uuid.uuid4().hex[:8]}"
    q = (
        lsh_band_verdicts_stream(bands)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("doc_id")
        .agg(F.max("dup_in_bucket").cast("bigint").alias("is_dup"))
        .orderBy("doc_id")
    )
