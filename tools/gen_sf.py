"""Scale-up generator for scaling smoke tests: replicate an existing
sf directory N times with id offsets into a new directory.

    python tools/gen_sf.py /root/testdata/sf0.1 .scratch/sf1 10

Foreign keys stay consistent (copy j offsets every key by j * max_key
of its table), value columns keep their source distributions, and the
dimension tables (region/nation) are copied as-is — so every catalog
query runs unchanged and its input row count scales by N. Timestamps in
``events`` keep their range (sessionization state does not grow with
N). This is a measurement tool for SCALING.md, not TPC-H dbgen parity.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (table, [id columns to offset]) — an id column is offset by
# j * ceil(max_id + 1) in copy j so keys never collide across copies and
# every FK pair (orders.o_custkey -> customer.c_custkey, etc.) lands on
# the same copy's rows.
FACTS: list[tuple[str, list[str]]] = [
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("orders", ["o_orderkey", "o_custkey"]),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ("events", ["event_id", "user_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]
DIMS = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1"
    n_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from qudo_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="gen_sf")
    os.makedirs(dst, exist_ok=True)

    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
        print(f"{t}: copied")

    # offsets from the per-table max id (one tiny agg per table)
    for t, id_cols in FACTS:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        maxes = df.agg(
            *[F.max(F.col(c)).alias(c) for c in id_cols]
        ).collect()[0]
        step = {c: int(maxes[c]) + 1 for c in id_cols}
        copies = []
        for j in range(n_copies):
            c = df
            for col in id_cols:
                c = c.withColumn(
                    col, (F.col(col) + F.lit(j * step[col])).cast("long")
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows ({n_copies}x)")

    spark.stop()


if __name__ == "__main__":
    main()
