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
        # coalesce small shuffles to the advisory byte target instead of
        # preserving parallelism: the inference plans' post-shuffle
        # intermediates are schema-bound (KB-scale) tables where 32
        # near-empty tasks cost more than the work — deliver-stats
        # steady-state drops ~15% measured. Large shuffles exceed the
        # advisory size and keep full parallelism either way.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce the shuffle that lays out small cached frames
        # (e.g. the contingency cell table) instead of pinning them at
        # shuffle.partitions mostly-empty slices
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        .config("spark.sql.session.timeZone", "UTC")
        # NO files.minPartitionNum / lowered openCostInBytes here: parquet
        # only splits at row-group boundaries, so forcing 32 input splits
        # of a single-row-group file yields 31 EMPTY tasks per scan (pure
        # scheduling overhead, zero parallelism) — measured as 1.2-2.4x
        # slowdowns on cheap queries. CPU-heavy per-row operators opt into
        # parallelism explicitly via catalog.load_table_spread, whose
        # repartition actually redistributes rows.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # 12g, not the machine's worth: an oversized heap turns young-gen
        # collections into multi-second full pauses that land on random
        # queries (measured 3-4 s spikes at 48g, none at 12g; bench total
        # 17 s -> 13 s). Local-mode data is MBs; a real cluster's driver
        # memory is submitter-supplied anyway.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _require_pinned_threads(spark)
    _quiet_sketch_window_warnings(spark)
    return spark


def _require_pinned_threads(spark: SparkSession) -> None:
    """Fail fast if PySpark pinned-thread mode is off. The pipeline's
    concurrent per-family fit/finalize threads rely on
    ``sc.setJobGroup`` being THREAD-LOCAL, which holds only under
    pinned-thread mode (PYSPARK_PIN_THREAD, default on since Spark
    3.2); with pinning disabled, concurrent job groups overwrite each
    other and a timeout's ``cancelJobGroup`` could cancel the wrong
    family's jobs. Pinned mode uses a py4j ClientServer gateway, so the
    gateway type is the authoritative runtime signal."""
    try:
        from py4j.clientserver import ClientServer

        pinned = isinstance(spark.sparkContext._gateway, ClientServer)
    except Exception:  # pragma: no cover - gateway internals moved
        return
    if not pinned:
        raise RuntimeError(
            "PySpark pinned-thread mode is disabled (PYSPARK_PIN_THREAD); "
            "the engine's concurrent per-family job groups require it — "
            "unset PYSPARK_PIN_THREAD or set it to 'true'"
        )


def _quiet_sketch_window_warnings(spark: SparkSession) -> None:
    """Silence WindowExec's "No Partition Defined ... single partition"
    warning. Every unpartitioned window in this engine is DELIBERATE
    and sketch-sized by construction (kmv_jaccard's ≤2k-row ranking,
    rrf_fuse's ≤Σk_i-row final window, bm25's top-k rank, the
    partition-count-sized prefix-sum offsets) — the warning cannot fire
    on a data-scaled frame here, and a burst of them floods bounded log
    tails. A constant partitionBy(lit(0)) key is NOT an alternative:
    Catalyst folds foldable partition expressions away, so the executed
    plan still has an empty partition spec and still warns (verified on
    the executed plan). Guarded per-logger, not a global level change;
    failures (e.g. a future log backend swap) degrade to the warning
    staying on."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:  # pragma: no cover - log backend unavailable
        pass
