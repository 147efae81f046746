"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query is forced with the noop sink (full computation, no result
materialization on the driver) after a warm-up of the session. Queries
cover the engine's hot paths: scan+agg, join+window top-k, the melt ->
one-shuffle contingency inference, dedup signatures, ANN top-k, and
sessionization windows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "topk_parts_per_brand",
    "deliver_stats_planted",
    "chi2_stat_by_variable",
    "minhash_signatures",
    "simhash16",
    "ann_bruteforce_topk",
    "user_sessions",
    "events_hourly",
    "dedup_exact_groups",
    # ML / inference hot paths
    "cluster_centroid_stats",
    "davies_bouldin_planted",
    "population_modes_planted",
    "kmodes_step_planted",
    "lsh_candidate_pairs",
    "session_window_agg",
]

# Round-4 corpus/packing operators: timed and reported as a SEPARATE
# series so the 16-query headline total stays comparable across rounds.
EXTENDED = [
    "repetition_stats",
    "pii_scrub_planted",
    "line_dedup_stats",
    "pack_boundary_seqs",
    "pack_greedy_seqs",
    "corpus_top_ngrams",
    "tfidf_top_terms",
    "stratified_sample_docs",
    "decontamination",
    "embedding_quantize",
    "semantic_dedup_verdicts",
    "ann_quantized_topk",
    "unigram_logprob_score",
    "source_kl_divergence",
    "inverted_index_tokens",
    "boolean_and_docs",
    # temporal / analytics / sketch operators
    "asof_purchase_attribution",
    "range_join_error_context",
    "events_rollup_grains",
    "time_weighted_value",
    "hourly_anomaly_zscore",
    "funnel_signup_click_purchase",
    "retention_matrix",
    "cdc_compact_orders",
    "scd2_order_history",
    "incremental_hourly_merge",
    "chunk_documents_overlap",
    "q3_shipping_priority",
    "equidepth_price_buckets",
    "cms_part_frequency",
    "bloom_filter_custkeys",
    "zorder_layout_lineitem",
    "span_dedup_stats",
    "dsir_selection",
    "pagerank_events_graph",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    from qudo_etl_pipeline_spark.catalog import registry
    from qudo_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = registry()

    # warm up the JVM / parquet footer caches and the Arrow python worker
    # pool with trivial actions (a deployed session pays both once)
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    from pyspark.sql import functions as F

    from qudo_etl_pipeline_spark.functions.stats import chi2_sf_udf

    spark.range(1).select(
        chi2_sf_udf()(F.lit(1.0), F.lit(1.0))
    ).collect()

    # Three timed passes per query; the headline `value`/`queries` series
    # is the min (steady-state throughput — the quantity that scales with
    # data size): single-shot numbers carry 3-5 s of one-off
    # whole-stage-codegen compilation and GC noise that lands on random
    # queries run-to-run (round 3's session_window_agg "regression" was
    # exactly this), and this VM additionally sees multi-second
    # noisy-neighbor windows (load-avg 15 with an idle guest, measured
    # round 4) that can poison any single pass. Each pass still pays
    # every real scan/shuffle/UDF cost (the noop sink materializes
    # nothing and the catalog builds a fresh plan per call; only
    # JVM-level compilation caches persist).
    #
    # For cross-round comparability BOTH series are emitted:
    #   queries / value                — min-of-PASSES (r3 was min-of-2)
    #   queries_single_shot / value_…  — first pass only (same as r1/r2)
    # PASS-MAJOR order (pass 0 for every query, then pass 1, ...): a
    # noisy-neighbor window on this VM lasts seconds, so three
    # back-to-back passes of ONE query can all land inside it and poison
    # even the min (round 3's session_window_agg 1.5 s reading: an
    # isolated re-run measures 0.40-0.56 s). Interleaving puts a query's
    # passes minutes apart, so min-of-N sees at least one quiet window.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    timings: dict[str, float] = {}
    first_pass: dict[str, float] = {}
    ext: dict[str, float] = {}

    def run_pass(names: list[str], out: dict[str, float], i: int) -> None:
        for name in names:
            t0 = time.time()
            specs[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = time.time() - t0
            if i == 0:
                if out is timings:
                    first_pass[name] = round(elapsed, 3)
                out[name] = round(elapsed, 3)
            else:
                out[name] = round(min(out[name], elapsed), 3)

    for i in range(passes):
        run_pass(HEADLINE, timings, i)
        run_pass(EXTENDED, ext, i)

    total = round(sum(timings.values()), 3)
    # Round-4 lesson: the driver's stdout capture is bounded and truncated
    # the single ~4 KB JSON line mid-way, losing the warm headline total
    # (BENCH_r04.json parsed: null). stdout now carries ONE COMPACT line
    # (headline series only, ~600 bytes); the full per-query detail
    # (single-shot + extended series) goes to BENCH_DETAIL.json next to
    # this script, committed per-round for the record.
    summary = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "passes": passes,
        "value_single_shot": round(sum(first_pass.values()), 3),
        "value_extended": round(sum(ext.values()), 3),
        "sf": sf,
    }
    detail = dict(summary)
    detail["queries_single_shot"] = first_pass
    detail["queries_extended"] = ext
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout summary still stands alone
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
