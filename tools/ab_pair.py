"""Solo paired A/B of a few headline queries against a git ref.

The round-10 closing record showed paired ratios of 1.16 (q1) / 1.13
(topk) against the r9 closing commit even though neither query's code
changed — odd, because paired interleaving should cancel session
noise. This tool re-measures JUST those queries with many more
interleaved passes (the full-bench pairing gives each query 3 passes
minutes apart; narrow pairing gives N back-to-back A/B segments
seconds apart, so per-pair machine drift is near zero) to separate a
real plan/import-side effect from noise:

    python tools/ab_pair.py <gitref> [query ...] [--passes N]

Prints one JSON line {query: {head, ref, ratio}, ...} over min-of-N.
Does NOT touch BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuse worktree + module-swap machinery)


def main() -> int:
    argv = list(sys.argv[1:])
    passes = 7
    if "--passes" in argv:
        i = argv.index("--passes")
        passes = int(argv[i + 1])
        del argv[i : i + 2]
    ref = argv[0]
    queries = argv[1:] or ["q1_pricing_summary", "topk_parts_per_brand"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    wt = bench._add_worktree(ref)
    if not wt:
        return 1
    roots = [REPO, wt]

    spark = None
    try:
        # validate names on BOTH sides before any measurement: a query
        # present only at HEAD would otherwise KeyError mid-loop and
        # leak the worktree + session (the try/finally below is the
        # backstop; the validation gives a readable error)
        for side in (REPO, wt):
            specs = bench._load_specs(side, roots)
            missing = [q for q in queries if q not in specs]
            if missing:
                sys.stderr.write(
                    f"queries absent from {side}: {missing}\n"
                )
                return 1

        from qudo_etl_pipeline_spark.session import get_spark

        spark = get_spark(app_name="ab_pair")
        spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # warm

        def run(specs, out, i):
            # scope from the LIVE module (each segment swaps
            # qudo_etl_pipeline_spark*): every timed call is one full
            # execution — same r13 protocol as bench.py run_pass
            from qudo_etl_pipeline_spark.operators.prefix import (
                prefix_cache_scope,
            )

            for q in queries:
                t0 = time.time()
                with prefix_cache_scope():
                    specs[q].spark(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                dt = time.time() - t0
                out[q] = min(out.get(q, dt), dt)

        head: dict[str, float] = {}
        refs: dict[str, float] = {}
        for i in range(passes):
            specs = bench._load_specs(REPO, roots)
            run(specs, head, i)
            specs = bench._load_specs(wt, roots)
            run(specs, refs, i)
        result = {
            q: {
                "head": round(head[q], 3),
                "ref": round(refs[q], 3),
                "ratio": round(head[q] / refs[q], 3),
            }
            for q in queries
        }
        print(
            json.dumps({"ref": ref, "passes": passes, "queries": result})
        )
        return 0
    finally:
        if spark is not None:
            spark.stop()
        bench._remove_worktree(wt)


if __name__ == "__main__":
    raise SystemExit(main())
