"""Query catalog: every operator exposed to the driver correctness gate.

Each entry pairs a Spark DataFrame implementation with (where SQL can
express it) an equivalent DuckDB oracle query. The driver compares the
two at sf0.01 by row count + schema + order-insensitive value hash, so:

- every computed column is explicitly aliased identically on both sides;
- sums over doubles are computed exactly via DECIMAL casts, then cast
  back to double (bit-identical across engines);
- ratios/statistics are ROUND()ed to fixed decimals on both sides;
- ranking queries always carry a deterministic tie-break key;
- output types are restricted to bigint / double / string.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    """One catalog entry: Spark impl + optional DuckDB oracle SQL."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: list[str] = field(default_factory=list)
    description: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    survey_ids: list[str] | None = None,
    description: str = "",
):
    """Decorator registering a (spark_fn, oracle_sql) pair."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        doc_first = (fn.__doc__ or "").strip().splitlines()
        _REGISTRY[name] = QuerySpec(
            name=name,
            spark=fn,
            oracle=oracle,
            survey_ids=survey_ids or [],
            description=description or (doc_first[0] if doc_first else ""),
        )
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    """All registered queries (imports every catalog module once)."""
    from qudo_etl_pipeline_spark.catalog import (  # noqa: F401
        analytics_q,
        checks_q,
        contingency_q,
        coverage_q,
        datapipe,
        entity_q,
        ml_q,
        relational,
        salted_q,
        sketches_q,
        streaming_q,
        temporal_q,
    )

    return dict(_REGISTRY)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_table_spread(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    predicate=None,
) -> DataFrame:
    """load_table + repartition to full parallelism IF the scan is narrow.

    ``columns`` prunes the projection BEFORE the repartition, so the
    spreading shuffle moves only the bytes the operator reads (an
    11-column fact table spread for a 1-column hash costs 10 columns of
    wasted shuffle IO otherwise). ``predicate`` (a Column) likewise
    filters BEFORE the repartition — rows a query caps away must not
    ride the spreading shuffle (and pushing the filter to the scan lets
    parquet row-group stats skip them entirely).

    For CPU-bound per-row work (md5 shingling, tokenization) over a
    small/single-row-group file, the scan yields fewer real partitions
    than cores and the map runs nearly single-threaded; shuffling the raw
    rows first is O(input bytes) — trivial exactly when the input is
    small. On a big input (many files/row groups) the condition is false
    and this is a no-op, so no full-data shuffle appears at scale.
    """
    df = load_table(spark, sf_dir, name)
    if columns is not None:
        df = df.select(*columns)
    if predicate is not None:
        df = df.where(predicate)
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with its ``ts`` column normalized to plain TIMESTAMP.

    The driver-generated file has carried three encodings across rounds:
    TIMESTAMP(NANOS) (readable only via nanosAsLong), TIMESTAMP_NTZ, and
    plain TIMESTAMP. Normalize all of them so every consumer
    (``unix_micros``, ``window``, ``date_format``) sees one type:

    - bigint nanos: floor-divide to micros with integer DIV (a double
      division would lose precision at 1e18 magnitudes) — the same
      ns->us truncation DuckDB's epoch_us applies;
    - TIMESTAMP_NTZ: cast to TIMESTAMP — the session timezone is pinned
      to UTC (session.py), so the wall-clock is preserved and matches
      DuckDB's naive timestamps.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# the ten source tables every oracle runs against — the single list
# tools/selfcheck.py and the registry-hygiene tests both bootstrap from
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def create_duckdb_views(con, sf_dir: str) -> None:
    """Register the source tables as DuckDB views over ``sf_dir``.

    Driver-generated SFs are single parquet files; gen_sf scale dirs
    are Spark-style directories of part files — glob those.
    """
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )


def none_last_key(v):
    """Sort key for driver-side catalog glue over collected values: a
    NULL segment/category label sorts AFTER every real value instead
    of raising Python 3's None-vs-str TypeError (hit by the r11
    NULL-salt sweep). Ordering of non-None values is unchanged, so
    NULL-free outputs are byte-identical."""
    return (v is None, "" if v is None else v)


def complex_typed_cols(schema) -> list[str]:
    """Column names the driver's pandas hasher cannot hash.

    THE driver-hashability rule (one definition — tools/selfcheck.py
    and tests/test_survey_coverage.py both enforce it from here): no
    catalog query may emit Array/Map/Struct columns; complex values
    must serialize to canonical JSON strings at the catalog layer.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
