"""Streaming table maintenance: a foreachBatch CDC-upsert sink.

The streaming twin of :func:`operators.analytics.cdc_compact`: a change
stream (upserts 'U' / deletes 'D') continuously maintains a compacted
parquet table. Exactly-once across restarts comes from two layers:

- the streaming checkpoint makes each micro-batch id stable: a replayed
  batch rewrites the SAME versioned directory (idempotent overwrite);
- the table is published via a tiny manifest committed as the LAST
  step of each batch — readers only ever see a fully-written version.
  The manifest COMMIT is the one storage-dependent step, so it is
  pluggable (:mod:`streaming.publish`): atomic rename (``_LATEST``,
  POSIX/HDFS) or a conditional-PUT commit log (``_commits/``,
  object-store-safe, Delta-commit shaped). A crash between the version
  write and the manifest commit replays the batch and repeats both
  steps with identical results; a crash AFTER the commit replays a
  batch the table already reflects, which the manifest's monotone
  batch id detects and skips (essential for the rollup sink, whose
  state merge is additive, not idempotent).

Each batch merges against the CURRENT table, so state never lives in
executor memory — table size is bounded by key cardinality, not stream
length, and the merge is `cdc_compact`'s single keyed shuffle. At
100 TB the version directories are partitioned/bucketed by the key and
old versions are vacuumed after a retention window.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators.analytics import cdc_compact
from qudo_etl_pipeline_spark.streaming.publish import (
    Publisher,
    resolve_publisher,
)

__all__ = ["read_maintained_table", "streaming_upsert", "streaming_rollup"]


def read_maintained_table(
    spark: SparkSession,
    table_path: str,
    publisher: Publisher | str | None = None,
) -> DataFrame | None:
    """Current published version of the maintained table, or None if no
    batch has committed yet. The commit protocol is auto-detected from
    the table directory unless ``publisher`` pins it."""
    m = resolve_publisher(table_path, publisher).read()
    if m is None:
        return None
    return spark.read.parquet(os.path.join(table_path, m["version"]))


def _publish(
    pub: Publisher,
    table_path: str,
    df: DataFrame,
    batch_id: int,
    gen: int = 0,
    query_id: str | None = None,
) -> None:
    """Write a version directory, then commit the manifest pointing at
    it through the table's :class:`Publisher`.

    ``gen`` (generation) increments on checkpoint-loss rebuilds so a
    rebuild's version directories never collide with — and never
    partially overwrite — the currently-published generation's."""
    version = (
        f"v_{gen:04d}_{batch_id:08d}" if gen else f"v_{batch_id:08d}"
    )
    df.write.mode("overwrite").parquet(os.path.join(table_path, version))
    pub.commit(
        {
            "version": version,
            "batch_id": batch_id,
            "gen": gen,
            "query_id": query_id,
        }
    )


def _query_id(checkpoint: str) -> str | None:
    """The streaming QUERY id persisted in the checkpoint metadata:
    stable across restarts of the same checkpoint, freshly generated
    when the checkpoint is lost — the reliable checkpoint-identity
    signal (batch ids alone can't distinguish a replay of a genuine
    batch 0 from a post-loss re-read that also starts at 0)."""
    mp = os.path.join(checkpoint, "metadata")
    if not os.path.exists(mp):
        return None
    return json.loads(open(mp).read()).get("id")


def _gate(
    m: dict | None, batch_id: int, query_id: str | None
) -> tuple[bool, bool, int]:
    """(skip, rebuild, gen) decision for an incoming batch.

    - same query id (intact checkpoint), replayed batch: manifest id >=
      batch id -> skip (exactly-once for non-idempotent merges);
    - DIFFERENT query id (checkpoint was lost and recreated): the
      re-read covers ALL source data (old + new), so skipping replayed
      ids would permanently drop whatever arrived after the last
      publish — REBUILD from scratch under gen+1, then let the rest of
      this incarnation's batches merge normally.
    """
    gen = (m or {}).get("gen", 0)
    if m is None:
        return False, False, gen
    if query_id is not None and m.get("query_id") != query_id:
        return False, True, gen + 1
    if m["batch_id"] >= batch_id:
        return True, False, gen
    return False, False, gen


def streaming_upsert(
    changes: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    ts_col: str,
    op_col: str = "op",
    publisher: Publisher | str | None = None,
):
    """Start an availableNow foreachBatch query maintaining
    ``table_path`` from the ``changes`` stream. Returns the
    StreamingQuery (caller awaits termination). ``publisher`` picks the
    manifest commit protocol ("rename" | "conditional_put" | instance;
    None auto-detects, defaulting to rename on fresh tables)."""
    spark = changes.sparkSession
    pub = resolve_publisher(table_path, publisher)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        qid = _query_id(checkpoint)
        skip, rebuild, gen = _gate(pub.read(), batch_id, qid)
        if skip:
            return
        current = (
            None if rebuild else read_maintained_table(spark, table_path, pub)
        )
        if current is None:
            # bootstrap/rebuild: empty snapshot in the payload schema
            current = batch.drop(op_col).filter(F.lit(False))
        merged = cdc_compact(current, batch, keys, ts_col, op_col)
        _publish(pub, table_path, merged, batch_id, gen, qid)

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_rollup(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    value_col: str,
    publisher: Publisher | str | None = None,
):
    """Continuously maintain a mergeable rollup state table
    (operators/incremental.py) from a raw event stream: each micro-batch
    is aggregated to its partial state (batch-sized work) and merged
    with the published state (state-sized work) — history is NEVER
    re-read, the streaming twin of ``incremental_hourly_merge``. Same
    versioned-manifest exactly-once publish as :func:`streaming_upsert`.
    DECIMAL-exact state means the result is bit-identical to a batch
    aggregate over the full history, regardless of batch boundaries
    (asserted in tests)."""
    from qudo_etl_pipeline_spark.operators.incremental import (
        merge_states,
        partial_state,
    )

    spark = stream.sparkSession
    pub = resolve_publisher(table_path, publisher)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        # unlike the latest-wins merge, state addition is NOT idempotent:
        # the manifest's batch id gates replays (a crash AFTER publish
        # but before the checkpoint commit replays the batch; without
        # this gate the delta would double-count)
        qid = _query_id(checkpoint)
        skip, rebuild, gen = _gate(pub.read(), batch_id, qid)
        if skip:
            return
        delta = partial_state(batch, keys, value_col)
        current = (
            None if rebuild else read_maintained_table(spark, table_path, pub)
        )
        merged = (
            delta if current is None else merge_states([current, delta], keys)
        )
        _publish(pub, table_path, merged, batch_id, gen, qid)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_heavy_hitters(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    key_col: str,
    capacity: int,
    publisher: Publisher | str | None = None,
):
    """Continuously maintain a Misra-Gries heavy-hitter summary from a
    raw stream — the streaming twin of ``sketches.heavy_hitters``'s
    pass 1, with the same exactly-once versioned-manifest publish as
    :func:`streaming_rollup`.

    Each micro-batch aggregates to exact (key, cnt) deltas
    (batch-sized), merges into the published summary by count addition,
    and compresses to ``capacity`` counters with the mergeable-summary
    rule (subtract the (capacity+1)-st largest, drop non-positives) —
    so after ANY number of batches the summary obeys the MG bound:
    true_count - n_total/(capacity+1) <= est <= true_count, and every
    key with frequency > n_total/(capacity+1) is present. The exact
    processed-row total rides along in the state (key NULL), giving
    the threshold denominator without a second stream.

    State size is <= capacity + 1 rows forever; like streaming_rollup
    the merge is NOT idempotent, so the manifest batch-id gate guards
    replays.
    """
    spark = stream.sparkSession
    pub = resolve_publisher(table_path, publisher)
    cap = int(capacity)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        qid = _query_id(checkpoint)
        skip, rebuild, gen = _gate(pub.read(), batch_id, qid)
        if skip:
            return
        # null stream keys must NOT reach the delta: a null __hk count
        # row would merge into the NULL-key total-row sentinel and
        # inflate n_total (nulls are already counted by batch.count()),
        # matching the batch kernel's dropna-candidates semantics
        delta = (
            batch.filter(F.col(key_col).isNotNull())
            .select(F.col(key_col).alias("__hk"))
            .groupBy("__hk")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        n_batch = batch.count()
        total_row = spark.createDataFrame(
            [(None, n_batch)], delta.schema
        )
        current = (
            None if rebuild else read_maintained_table(spark, table_path, pub)
        )
        parts = [delta, total_row] + ([current] if current is not None else [])
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        merged = u.groupBy("__hk").agg(F.sum("cnt").alias("cnt"))
        keys_only = merged.filter(F.col("__hk").isNotNull())
        # state-sized compression: subtract the (cap+1)-st largest
        if keys_only.count() > cap:
            m = (
                keys_only.orderBy(F.desc("cnt"))
                .limit(cap + 1)
                .agg(F.min("cnt"))
                .collect()[0][0]
            )
            keys_only = keys_only.select(
                "__hk", (F.col("cnt") - F.lit(m)).alias("cnt")
            ).filter(F.col("cnt") > 0)
        out = keys_only.unionByName(
            merged.filter(F.col("__hk").isNull())
        )
        _publish(pub, table_path, out, batch_id, gen, qid)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
