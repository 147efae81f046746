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

    return docs.withColumn(
        "text_hash", exact_dup_hash(text_col)
    ).dropDuplicates(["text_hash"])


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
