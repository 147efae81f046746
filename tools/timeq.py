"""Time individual catalog queries: python tools/timeq.py name [name...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PASSES (default 2),
SCOPED=0 to disable per-pass cache scoping (legacy warm behavior).
Same methodology as bench.py (noop sink, warm-up, min-of-PASSES, each
pass inside prefix_cache_scope so it measures one full execution) so
numbers are comparable with BENCH_r*.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("PASSES", "2"))
    names = sys.argv[1:]

    from pyspark.sql import functions as F

    from qudo_etl_pipeline_spark.catalog import registry
    from qudo_etl_pipeline_spark.functions.stats import chi2_sf_udf
    from qudo_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="timeq")
    specs = registry()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spark.range(1).select(chi2_sf_udf()(F.lit(1.0), F.lit(1.0))).collect()

    import contextlib

    from qudo_etl_pipeline_spark.operators.prefix import (
        prefix_cache_scope,
    )

    scoped = os.environ.get("SCOPED", "1") != "0"
    out: dict[str, list[float]] = {}
    for name in names:
        spec = specs[name]
        times = []
        for _ in range(passes):
            t0 = time.time()
            scope = prefix_cache_scope() if scoped else (
                contextlib.nullcontext()
            )
            with scope:
                df = spec.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        out[name] = times
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
