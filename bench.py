"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query is forced with the noop sink (full computation, no result
materialization on the driver) after a warm-up of the session, INSIDE
``prefix_cache_scope()`` so that every operator cache acquired during
the timed call is released when it ends — every pass is one full
execution from the parquet inputs (r12 verdict item 1; an unscoped
"legacy warm" series is still emitted for pre-r13 comparability).
Queries cover the engine's hot paths: scan+agg, join+window top-k, the
melt -> one-shuffle contingency inference, dedup signatures, ANN
top-k, and sessionization windows.

Paired A/B mode (the cross-round noise killer): this VM's
noisy-neighbor band swings identical code up to 1.3x between bench
runs, so two rounds' absolute totals cannot distinguish a real 20%
plan regression from noise. When ``BENCH_AB_REF`` (a committed file
holding the previous round's final commit) resolves — or ``--ab
<gitref>`` / ``$SPARK_GRAFT_AB_REF`` overrides it — the harness checks
that ref out into a throwaway git worktree and, inside the SAME Spark
session, interleaves the two HEADs' headline passes
(A,B,A,B,... min-of-N): any machine-wide slowdown hits both sides of
a pair equally, so the per-query ratio isolates plan changes. Module
identity is swapped per segment (purge ``qudo_etl_pipeline_spark*``
from sys.modules + re-point sys.path) so each side's lazy imports
resolve to its own code while the JVM, parquet footer caches, and
codegen cache stay shared. The stdout summary gains a compact
``vs_prev_head`` block (ref, per-query ratio, total ratio);
BENCH_DETAIL.json carries both sides' full per-query series.
``SPARK_GRAFT_AB=0`` disables.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

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
    "semantic_dedup_scaled",
    # r12: k-proportional-to-n configuration (absent from the sf1/sf3
    # extended records taken earlier this round; scale shape measured
    # solo min-of-5 in SCALING.md instead)
    "semantic_dedup_autok",
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
    # round-6 second wave: exact statistics / series / spatial
    "heavy_hitters_planted",
    "kaplan_meier_orders",
    "winsorize_prices",
    "exact_quantile_totalprice",
    "quantile_normalize_embeddings",
    "weighted_median_prices",
    "mann_whitney_quantity",
    "cusum_hourly_drift",
    "resample_interpolate_hourly",
    "lag_crosscorr_view_purchase",
    "spatial_radius_pairs",
    "q5_local_supplier_volume",
    "bootstrap_ci_totalprice",
    "cohort_ltv_curves",
    "theil_sen_hourly_trend",
    "ks_test_totalprice",
    "cramers_v_by_variable",
    "source_js_divergence",
    "rake_weights_customers",
    "kish_neff_quantity",
    # round-7: scale-safe rank statistics (prefix-sum device)
    "ks_test_totalprice_binned",
    "running_revenue_ecdf",
    "table_diff_orders_planted",
    "q18_large_volume_customers",
    "seasonal_decompose_hourly",
    "q4_late_shipment_priority",
    "q14_promo_revenue_share",
    "psi_drift_priority_prices",
    "gains_curve_planted",
    # round-9: ALL TPC-H shapes not already in a series, so the full
    # 22-shape family is perf-tracked round-over-round (q1 is headline;
    # q3/q4/q5/q14/q18 were already extended)
    "q6_forecast_revenue",
    "q7_nation_volume_shipping",
    "q10_returned_item_reporting",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_late_shipment_modes",
    "q16_supplier_part_variety",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
]


def _load_specs(path: str, roots: list[str]) -> dict:
    """Import ``path``'s catalog registry as the live package version.

    Purges every ``qudo_etl_pipeline_spark*`` module and re-points
    sys.path so BOTH the import below and any lazy in-function imports
    executed afterwards resolve to ``path``'s code. Cheap (~100 ms of
    pure-Python re-import) relative to a bench pass."""
    for m in [
        m
        for m in sys.modules
        if m == "qudo_etl_pipeline_spark"
        or m.startswith("qudo_etl_pipeline_spark.")
    ]:
        del sys.modules[m]
    sys.path[:] = [p for p in sys.path if p not in roots]
    sys.path.insert(0, path)
    from qudo_etl_pipeline_spark.catalog import registry

    return registry()


def _ab_ref(argv: list[str]) -> str | None:
    """The A/B comparison ref: --ab <gitref> > $SPARK_GRAFT_AB_REF >
    the committed BENCH_AB_REF file; SPARK_GRAFT_AB=0 disables."""
    if os.environ.get("SPARK_GRAFT_AB", "1") == "0":
        return None
    if "--ab" in argv:
        return argv[argv.index("--ab") + 1]
    if os.environ.get("SPARK_GRAFT_AB_REF"):
        return os.environ["SPARK_GRAFT_AB_REF"]
    ref_file = os.path.join(REPO, "BENCH_AB_REF")
    if os.path.exists(ref_file):
        ref = open(ref_file).read().split("#", 1)[0].strip()
        return ref or None
    return None


def _add_worktree(ref: str) -> str | None:
    """Detached worktree of ``ref`` under /tmp; None if git can't."""
    wt = tempfile.mkdtemp(prefix="bench_ab_")
    r = subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, ref],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        sys.stderr.write(f"A/B disabled: worktree add failed: {r.stderr}\n")
        os.rmdir(wt)
        return None
    return wt


def _remove_worktree(wt: str) -> None:
    subprocess.run(
        ["git", "-C", REPO, "worktree", "remove", "--force", wt],
        capture_output=True,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    ab_ref = _ab_ref(sys.argv)
    ab_path = _add_worktree(ab_ref) if ab_ref else None
    roots = [REPO] + ([ab_path] if ab_path else [])

    from qudo_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = _load_specs(REPO, roots)

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
    # round 4) that can poison any single pass.
    #
    # SCOPED passes (r12 verdict item 1 — the measurement-integrity
    # fix): each timed call runs inside ``prefix_cache_scope()``, so
    # every operator cache the query acquires (the plan-keyed registry
    # that ~20 operators route through since r12) is RELEASED when the
    # call's result is fully materialized — min-of-N selects the
    # fastest FULL execution, never a pass that reuses a previous
    # pass's materialized cache. Intra-query cache sharing (several
    # plan branches reading one materialized collapse within a single
    # execution) is preserved — that is the optimization being
    # measured; cross-pass reuse is what the scope kills. Only
    # JVM-level compilation caches persist across passes.
    #
    # Series emitted:
    #   queries / value                  — min-of-PASSES, SCOPED (one
    #                                      full execution per pass)
    #   queries_single_shot / value_…    — first pass only (same
    #                                      semantics as r1..r12: the
    #                                      session's first execution)
    #   queries_legacy_warm / value_…    — min over LEGACY_PASSES
    #                                      unscoped back-to-back passes
    #                                      run AFTER the scoped ones
    #                                      (cross-pass cache reuse
    #                                      allowed), comparable with the
    #                                      r4-r12 warm min-of-3 records
    # PASS-MAJOR order (pass 0 for every query, then pass 1, ...): a
    # noisy-neighbor window on this VM lasts seconds, so three
    # back-to-back passes of ONE query can all land inside it and poison
    # even the min (round 3's session_window_agg 1.5 s reading: an
    # isolated re-run measures 0.40-0.56 s). Interleaving puts a query's
    # passes minutes apart, so min-of-N sees at least one quiet window.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    legacy_passes = int(
        os.environ.get("SPARK_GRAFT_BENCH_LEGACY_PASSES", "2")
    )
    # SPARK_GRAFT_BENCH_EXTENDED=0 skips the extended series — for
    # off-SF anchor runs (sf1/sf3) where only the 16-query headline is
    # recorded and the 80-query extended sweep would multiply the cost
    extended = (
        EXTENDED
        if os.environ.get("SPARK_GRAFT_BENCH_EXTENDED", "1") != "0"
        else []
    )
    timings: dict[str, float] = {}
    first_pass: dict[str, float] = {}
    ext: dict[str, float] = {}
    ref_timings: dict[str, float] = {}

    def run_pass(
        sp: dict,
        names: list[str],
        out: dict[str, float],
        i: int,
        scoped: bool = True,
    ) -> None:
        # the scope is imported from the LIVE module so the B segment's
        # acquisitions release through ITS registry (bench._load_specs
        # swaps qudo_etl_pipeline_spark* per segment). Caveat recorded
        # in OPTIMIZATION_r13.md: a ref predating the registry routing
        # of its cache sites keeps those warm across passes, which can
        # only flatter the REF side (the head/ref ratio is conservative)
        from qudo_etl_pipeline_spark.operators.prefix import (
            prefix_cache_scope,
        )

        for name in names:
            t0 = time.time()
            if scoped:
                with prefix_cache_scope():
                    sp[name].spark(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
            else:
                sp[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            elapsed = time.time() - t0
            if i == 0:
                if out is timings:
                    first_pass[name] = round(elapsed, 3)
                out[name] = round(elapsed, 3)
            else:
                out[name] = round(min(out[name], elapsed), 3)

    # which headline queries the comparison ref also has (new queries
    # have no paired counterpart and are skipped from the B side)
    ab_queries: list[str] = []
    if ab_path:
        ref_specs = _load_specs(ab_path, roots)
        ab_queries = [q for q in HEADLINE if q in ref_specs]
        specs = _load_specs(REPO, roots)

    for i in range(passes):
        # A segment (this HEAD), then B segment (the ref) back-to-back
        # inside the same session: pass-level interleave means a noisy
        # window spanning minutes degrades BOTH sides of the pair
        run_pass(specs, HEADLINE, timings, i)
        run_pass(specs, extended, ext, i)
        if ab_path:
            ref_specs = _load_specs(ab_path, roots)
            run_pass(ref_specs, ab_queries, ref_timings, i)
            specs = _load_specs(REPO, roots)

    # legacy-warm series: unscoped back-to-back passes AFTER the scoped
    # ones (all operator caches start released, so pass 0 rebuilds them
    # and pass 1+ reuses — the r4-r12 warm-pass behavior). Emitted for
    # cross-round continuity with the pre-r13 records only; the primary
    # series above is the corrected one.
    legacy: dict[str, float] = {}
    ext_legacy: dict[str, float] = {}
    for i in range(legacy_passes):
        run_pass(specs, HEADLINE, legacy, i, scoped=False)
        run_pass(specs, extended, ext_legacy, i, scoped=False)

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
        # r13 measurement fix: the primary series is SCOPED — min over
        # full executions (operator caches released per timed call)
        "series": "scoped-full-execution",
        "value_single_shot": round(sum(first_pass.values()), 3),
        "value_extended": round(sum(ext.values()), 3),
        "sf": sf,
    }
    if legacy:
        summary["value_legacy_warm"] = round(sum(legacy.values()), 3)
        summary["value_extended_legacy_warm"] = round(
            sum(ext_legacy.values()), 3
        )
    if ref_timings:
        ref_total = round(sum(ref_timings.values()), 3)
        head_total = round(
            sum(timings[q] for q in ref_timings), 3
        )  # same query subset as the ref side
        summary["vs_prev_head"] = {
            "ref": ab_ref,
            "method": "paired-interleaved-min-of-%d" % passes,
            "head_sec": head_total,
            "ref_sec": ref_total,
            "ratio": round(head_total / ref_total, 3) if ref_total else None,
            "ratios": {
                q: round(timings[q] / ref_timings[q], 2)
                if ref_timings[q]
                else None
                for q in ref_timings
            },
        }
    detail = dict(summary)
    detail["queries_single_shot"] = first_pass
    detail["queries_extended"] = ext
    if legacy:
        detail["queries_legacy_warm"] = legacy
        detail["queries_extended_legacy_warm"] = ext_legacy
    if ref_timings:
        detail["queries_prev_head"] = ref_timings
    # Detail destination: BENCH_DETAIL.json is the committed per-round
    # sf0.1 record (headline + extended). A headline-only run (extended
    # skipped — the off-SF anchor mode) must NOT clobber it with
    # queries_extended={} / value_extended=0, so it writes to
    # BENCH_DETAIL_HEADLINE.json instead; $SPARK_GRAFT_BENCH_DETAIL
    # overrides either destination explicitly (scale-anchor flows).
    default_name = (
        "BENCH_DETAIL.json" if extended else "BENCH_DETAIL_HEADLINE.json"
    )
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), default_name
        ),
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout summary still stands alone
    print(json.dumps(summary))
    spark.stop()
    if ab_path:
        _remove_worktree(ab_path)


if __name__ == "__main__":
    main()
