"""Dump ``.explain("formatted")`` plans for catalog queries to files.

Judge-facing evidence for optimization rounds: for every query an
optimization touched, commit the physical plan before and after —

    python tools/dump_plans.py <out_dir> <suffix> [sf_dir] [query ...]

writes ``<out_dir>/<query>_<suffix>.txt`` per query (suffix is
``before`` at the pre-round ref, ``after`` at HEAD). Run it inside a
git worktree of the old ref to produce the ``before`` side. Without
explicit names, dumps the bench headline set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    from bench import HEADLINE
    from qudo_etl_pipeline_spark.catalog import registry
    from qudo_etl_pipeline_spark.session import get_spark

    names = sys.argv[4:] or HEADLINE
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    specs = registry()
    for name in names:
        if name not in specs:
            print(f"skip {name}: not registered at this ref")
            continue
        df = specs[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
