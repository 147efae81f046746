"""SparkSession factory tuned for the engine.

Local-mode defaults match the test/bench environment (single JVM,
``local[N]``); on a real cluster the same builder is used with master
and memory supplied by the submitter. Every knob here is scale-motivated:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting is
  what keeps the 100 TB plans healthy without hand-tuning per query.
- shuffle.partitions sized to cores locally; on a cluster AQE coalesces
  from a deliberately-high initial number.
- Arrow enabled: every pandas_udf / toPandas crossing is vectorized.
- UTC session timezone: parity with the DuckDB oracle (naive-UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "qudo_etl_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce the shuffle that lays out small cached frames
        # (e.g. the contingency cell table) instead of pinning them at
        # shuffle.partitions mostly-empty slices
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        .config("spark.sql.session.timeZone", "UTC")
        # split small files into at least one partition per core so
        # CPU-heavy per-row expressions (hashing, shingling) parallelize
        # even when a table arrives as a single file; on a real cluster
        # big tables already exceed this floor, so it is scale-neutral
        .config("spark.sql.files.minPartitionNum", str(max(shuffle_partitions, cpus)))
        # the 4 MB open-cost floor forces megabyte-scale files into one
        # split, serializing CPU-heavy maps (md5 shingling) locally; 64 KB
        # keeps small tables splittable without affecting multi-GB scans
        .config("spark.sql.files.openCostInBytes", str(64 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
