"""Per-query PLAN-BUILD profile: py4j round-trips + build vs exec time.

The r12 scaling block proved every headline query is fixed-cost bound
at sf0.1 (8-core wall ~= 32-core wall): the residual lever is the
per-query fixed overhead — plan build (py4j socket round-trips +
Catalyst analysis, single-threaded driver work) and job scheduling.
This tool measures, per catalog query:

- ``build_s``   — seconds for ``spec.spark(spark, sf_dir)`` (py4j call
  chain + eager analysis of every intermediate DataFrame);
- ``py4j``      — py4j ``send_command`` round-trips issued during the
  build (each is one driver<->JVM socket round-trip, the quantity the
  contingency lateral-alias fuse attacked in r12 §10);
- ``exec_s``    — seconds for the noop-sink write of the built frame
  (optimization + physical planning + execution).

Usage: python tools/build_profile.py [name ...]   (default: all)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PASSES (min-of,
default 2). Each pass runs inside ``prefix_cache_scope`` so pass 2
rebuilds operator caches — build numbers are cold-equivalent per pass.
Prints one JSON line per query plus a sorted summary on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_COUNT = {"n": 0}


def _install_py4j_counter() -> None:
    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    def wrap(cls):
        orig = cls.send_command

        def counted(self, *a, **kw):
            _COUNT["n"] += 1
            return orig(self, *a, **kw)

        cls.send_command = counted

    # pinned-thread mode (the engine asserts it) routes through
    # ClientServerConnection; the plain gateway path is patched too so
    # the tool keeps counting if the gateway type ever changes
    wrap(cs.ClientServerConnection)
    wrap(jg.GatewayConnection)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("PASSES", "2"))
    _install_py4j_counter()

    from pyspark.sql import functions as F

    from qudo_etl_pipeline_spark.catalog import registry
    from qudo_etl_pipeline_spark.functions.stats import chi2_sf_udf
    from qudo_etl_pipeline_spark.operators.prefix import prefix_cache_scope
    from qudo_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="build_profile")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spark.range(1).select(chi2_sf_udf()(F.lit(1.0), F.lit(1.0))).collect()

    specs = registry()
    names = sys.argv[1:] or sorted(specs)
    rows = []
    for name in names:
        spec = specs[name]
        best = None
        for _ in range(passes):
            with prefix_cache_scope():
                c0, t0 = _COUNT["n"], time.time()
                df = spec.spark(spark, sf_dir)
                t1, c1 = time.time(), _COUNT["n"]
                df.write.format("noop").mode("overwrite").save()
                t2 = time.time()
            rec = {
                "query": name,
                "build_s": round(t1 - t0, 3),
                "py4j": c1 - c0,
                "exec_s": round(t2 - t1, 3),
            }
            if best is None:
                best = rec
            else:
                best["build_s"] = min(best["build_s"], rec["build_s"])
                best["exec_s"] = min(best["exec_s"], rec["exec_s"])
                best["py4j"] = min(best["py4j"], rec["py4j"])
        best["total_s"] = round(best["build_s"] + best["exec_s"], 3)
        rows.append(best)
        print(json.dumps(best), flush=True)

    rows.sort(key=lambda r: -r["build_s"])
    sys.stderr.write("\n== top plan-build cost ==\n")
    for r in rows[:25]:
        sys.stderr.write(
            f"{r['query']:36s} build={r['build_s']:6.3f}s "
            f"py4j={r['py4j']:5d} exec={r['exec_s']:6.3f}s\n"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
