"""Streaming operators: session windows + custom stateful aggregation.

The reference has no streaming surface (SURVEY §2.8); these extend the
engine per the north star. Two shapes:

- ``session_window_counts``: Spark's built-in ``session_window`` — works
  identically on batch and streaming DataFrames, which is the idiomatic
  way to express gap-based sessionization (state management, watermarks,
  and merge logic are handled by the engine).
- ``running_user_counts_stream``: a custom stateful operator via
  ``applyInPandasWithState`` (GroupState), the template for operators the
  built-ins can't express (per-key model state, decayed counters, ...).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def session_window_counts(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Events per (user, gap-session): batch/streaming-agnostic plan."""
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.date_format("sess.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def dedup_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each content hash wins,
    across micro-batches.

    Spark-first: ``dropDuplicates`` on a streaming frame is the built-in
    stateful dedup operator (state = one entry per distinct hash, exactly
    the structure a hand-rolled GroupState version would keep). For
    unbounded streams add ``withWatermark`` on an event-time column +
    ``dropDuplicatesWithinWatermark`` so the hash state expires; a
    training-corpus backfill (availableNow) wants the unexpiring form —
    a dup is a dup no matter how far apart the copies arrive.
    """
    from qudo_etl_pipeline_spark.operators.dedup import exact_dup_hash

    # key on (hash, length): a bare 60-bit hash key expects ~n^2/2^61
    # birthday collisions (a couple of silent false drops at 2e9 docs);
    # the length co-key pushes that far below corpus scale while the
    # state stays two fixed-width columns
    return docs.withColumn(
        "text_hash", exact_dup_hash(text_col)
    ).withColumn(
        "text_len", F.length(F.col(text_col)).cast("long")
    ).dropDuplicates(["text_hash", "text_len"])


_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("total_events", T.LongType()),
    ]
)


def running_user_counts_stream(events: DataFrame) -> DataFrame:
    """Running per-user event totals with explicit GroupState.

    Template for custom stateful streaming operators: state is a single
    long per key, updated per micro-batch; output is the new total
    (update semantics).
    """

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in batches:
            n += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def attribution_join(
    triggers: DataFrame,
    touches: DataFrame,
    horizon: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Stream-stream interval join: attribute each trigger event (e.g.
    purchase) to the touch events (e.g. clicks) by the same user within
    the preceding ``horizon``.

    The canonical watermarked stream-stream join: both sides carry an
    event-time watermark and the join condition bounds the two event
    times against each other, so the engine can discard touch state
    older than the horizon — state stays O(events within horizon), not
    O(stream). On batch frames ``withWatermark`` is a no-op and the
    same plan is a plain interval self-join, so one definition serves
    both the backfill and the live pipeline (the oracle checks the
    drained streaming run against the batch SQL).

    Returns (trigger_id, touch_id, user_id, gap_us, value): one row per
    attributed pair, gap in exact integer microseconds.
    """
    t = (
        triggers.select(
            F.col(id_col).alias("trigger_id"),
            F.col(user_col).alias(user_col),
            F.col(ts_col).alias("trigger_ts"),
            F.col(value_col).alias("value"),
        )
        .withWatermark("trigger_ts", horizon)
    )
    c = (
        touches.select(
            F.col(id_col).alias("touch_id"),
            F.col(user_col).alias("_touch_user"),
            F.col(ts_col).alias("touch_ts"),
        )
        .withWatermark("touch_ts", horizon)
    )
    joined = t.join(
        c,
        F.expr(
            f"{user_col} = _touch_user AND "
            f"touch_ts >= trigger_ts - INTERVAL {horizon} AND "
            "touch_ts <= trigger_ts"
        ),
    )
    return joined.select(
        "trigger_id",
        "touch_id",
        F.col(user_col),
        (F.unix_micros("trigger_ts") - F.unix_micros("touch_ts")).alias(
            "gap_us"
        ),
        "value",
    )


_LSH_STATE_SCHEMA = T.StructType([T.StructField("min_id", T.LongType())])
_LSH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("band", T.LongType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("dup_in_bucket", T.LongType()),
    ]
)


def lsh_band_verdicts_stream(
    bands: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Streaming NEAR-dup gating: first-arrival-wins verdicts per LSH
    (band, bucket), across micro-batches — the continuous-ingestion
    twin of :func:`~qudo_etl_pipeline_spark.operators.dedup.
    lsh_candidate_pairs`'s batch candidate generation. Feed it
    ``lsh_bands(minhash_signatures(docs_stream))`` (both stateless,
    so they run unchanged on a streaming frame); a document is a
    near-dup CANDIDATE iff any of its bucket rows comes back with
    ``dup_in_bucket = 1`` (OR-reduce per doc downstream, e.g. in the
    drained batch table).

    State is ONE long per distinct (band, bucket) — the earliest doc id
    ever seen — NOT a membership list: a boilerplate mega-bucket costs
    8 bytes of state no matter how many millions of rows hash into it,
    so the state store scales with the bucket space, never the corpus.
    Within a batch the group's rows are processed in ascending id order
    (ids ARE the backfill arrival order), which makes a single
    availableNow drain equal to the batch SQL
    ``id > MIN(id) OVER (PARTITION BY band, bucket)`` verdict exactly;
    across batches first-ARRIVAL wins (streaming dedup semantics — a
    late-arriving smaller id does not retract earlier verdicts).
    """

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ids: list[int] = []
        for pdf in batches:
            ids.extend(int(i) for i in pdf[id_col])
        ids.sort()
        (prior,) = state.get if state.exists else (None,)
        survivor = prior
        dup = []
        for i in ids:
            # exactly ONE survivor per bucket: the first arrival takes
            # it; every later arrival — even a smaller id — is flagged
            if survivor is None:
                survivor = i
                dup.append(0)
            else:
                dup.append(1)
        state.update((int(survivor),))
        yield pd.DataFrame(
            {
                "band": [int(key[0])] * len(ids),
                "bucket": [int(key[1])] * len(ids),
                "doc_id": ids,
                "dup_in_bucket": dup,
            }
        )

    # id-less or bucket-less rows can neither receive nor anchor a
    # verdict — filter them BEFORE the stateful operator (pushed to the
    # stream scan) instead of letting int(NaN) blow up the update
    # kernel mid-batch (r11 NULL-salt sweep)
    clean = bands.filter(
        F.col(id_col).isNotNull()
        & F.col("band").isNotNull()
        & F.col("bucket").isNotNull()
    )
    return clean.groupBy("band", "bucket").applyInPandasWithState(
        update,
        outputStructType=_LSH_OUT_SCHEMA,
        stateStructType=_LSH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
