"""Physical-plan evidence tests.

SCALING.md's claims about the scan layer are pinned here so a regression
is a test failure, not a stale doc: filters reach the parquet scan
(PushedFilters), projections prune the read schema (ReadSchema), and
partitioned layouts prune directories (PartitionFilters).
"""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select(
        "l_returnflag", "l_quantity"
    )
    plan = _formatted(q)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("\n")[0]
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_returnflag" in read_schema and "l_quantity" in read_schema
    # untouched wide columns must not be read
    assert "l_comment" not in read_schema


def test_bucketed_join_is_exchange_free(spark):
    """Bucketing co-locates join keys at WRITE time: a join of two tables
    bucketed the same way needs no shuffle at all — the layout strategy
    SCALING.md prescribes for repeated fact-to-fact joins at scale."""
    spark.sql("DROP TABLE IF EXISTS bj_orders")
    spark.sql("DROP TABLE IF EXISTS bj_customer")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    try:
        o.write.bucketBy(4, "o_custkey").sortBy("o_custkey").mode(
            "overwrite"
        ).saveAsTable("bj_orders")
        c.write.bucketBy(4, "c_custkey").sortBy("c_custkey").mode(
            "overwrite"
        ).saveAsTable("bj_customer")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bj_orders").join(
                spark.table("bj_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = _formatted(j)
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            assert j.count() == o.join(
                c, o.o_custkey == c.c_custkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bj_orders")
        spark.sql("DROP TABLE IF EXISTS bj_customer")


def test_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "orders_by_status")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    o.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)

    q = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = _formatted(q)
    part_filters = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "o_orderstatus" in part_filters
    # the partition predicate must not appear as a post-scan Filter on data
    assert q.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_q3_star_query_plan_shape(spark):
    """TPC-H Q3 shape: both fact filters reach the scans, dimensions
    broadcast (no sort-merge join), and the top-10 is a
    TakeOrderedAndProject rather than a global sort."""
    from qudo_etl_pipeline_spark.catalog import registry

    q3 = registry()["q3_shipping_priority"].spark(spark, SF_DIR)
    plan = _formatted(q3)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan
    # date predicates reached the parquet readers
    pushed = [seg.split("\n")[0] for seg in plan.split("PushedFilters")[1:]]
    assert any("o_orderdate" in p for p in pushed)
    assert any("l_shipdate" in p for p in pushed)
    assert any("c_mktsegment" in p for p in pushed)


def test_new_corpus_ops_plan_shapes(spark):
    """Round-4 operators' scale claims, pinned as plan assertions:
    - span dedup / DSIR / BM25 read ONLY (doc_id, text[, source]) from
      the documents scan (projection pruned before the spread shuffle);
    - BM25's tf pivot leaves no join of the token stream (df/N/avgdl
      ride a broadcast);
    - no Python eval nodes anywhere (all-JVM expressions)."""
    from qudo_etl_pipeline_spark.catalog import registry

    specs = registry()
    for name, cols in [
        ("span_dedup_stats", {"doc_id", "text"}),
        ("dsir_selection", {"doc_id", "text", "source"}),
        ("bm25_topk_docs", {"doc_id", "text"}),
    ]:
        plan = _formatted(specs[name].spark(spark, SF_DIR))
        read_schema = plan.split("ReadSchema")[1].split("\n")[0]
        for c in cols:
            assert c in read_schema, (name, c, read_schema)
        assert "lang" not in read_schema and "n_chars" not in read_schema, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
    # BM25: no SortMergeJoin — the only join inputs are 1-row broadcasts
    bm25_plan = _formatted(specs["bm25_topk_docs"].spark(spark, SF_DIR))
    assert "SortMergeJoin" not in bm25_plan
    assert "BroadcastNestedLoopJoin" in bm25_plan or "BroadcastHashJoin" in bm25_plan


def test_expensive_extended_query_plan_shapes(spark):
    """Plan-shape budgets for the five most expensive extended-series
    queries (round-4 verdict item 9): a plan regression — a Python eval
    node sneaking in, a broadcast flipping to sort-merge, a top-k
    decaying to a global sort, a cartesian product — fails here in
    pytest instead of only showing up in the bench file.

    explain('formatted') lists each node twice (tree + details), so
    exact counts are asserted as 2x.
    """
    from qudo_etl_pipeline_spark.catalog import registry

    specs = registry()
    plans = {
        n: _formatted(specs[n].spark(spark, SF_DIR))
        for n in (
            "pagerank_events_graph",
            "semantic_dedup_verdicts",
            "dsir_selection",
            "cms_part_frequency",
            "tfidf_top_terms",
        )
    }
    for name, plan in plans.items():
        # no Python crossings and no all-pairs shapes anywhere
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name

    # pagerank: the small-graph dispatch ran the power loop on the
    # collected contraction, so the returned frame is a driver-local
    # table — no join/agg chain re-derived per action (the distributed
    # >max_collect_edges loop is pinned bit-identical by
    # test_pagerank_driver_contraction_matches_distributed)
    assert "LocalTableScan" in plans["pagerank_events_graph"]
    assert "Join" not in plans["pagerank_events_graph"]

    # semantic dedup: ONE sort-merge join (the within-cell pair join —
    # both sides corpus-scaled), everything else broadcast
    p = plans["semantic_dedup_verdicts"]
    assert p.count("SortMergeJoin") == 2, p.count("SortMergeJoin")
    assert p.count("BroadcastHashJoin") == 2
    assert "BroadcastNestedLoopJoin" not in p
    # r10: the tagged (assign + norm) frame is persisted ONCE — all
    # three consumers read the cache (InMemoryTableScan), never a
    # re-derived assignment (the 3x-recompute that made sf1 cost 41 s
    # instead of ~22 s). explain('formatted') prints each node twice.
    assert p.count("InMemoryTableScan") >= 6, p.count("InMemoryTableScan")

    # dsir: single feature pass ends in a distributed top-k, never a
    # global sort; the only join is the broadcast of tiny LM weights
    p = plans["dsir_selection"]
    assert p.count("TakeOrderedAndProject") == 2
    assert "SortMergeJoin" not in p and "Sort " not in p.split("TakeOrdered")[0]
    assert p.count("BroadcastHashJoin") == 2

    # cms: sketch joins are broadcast-only (the sketch is row-count-
    # independent and tiny by construction)
    p = plans["cms_part_frequency"]
    assert p.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p

    # tfidf: the 1-row corpus-totals crossJoin stays a BROADCAST nested
    # loop; the doc-frequency join stays broadcast hash
    p = plans["tfidf_top_terms"]
    assert p.count("BroadcastNestedLoopJoin") == 2
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_round6_second_wave_plan_shapes(spark):
    """Round-6 second-wave operators' scale claims as plan assertions:

    - winsorize / weighted_median: bounds/stats come back via
      BroadcastHashJoin (big side never re-shuffled), no sort-merge;
    - kaplan_meier / mann_whitney / gini / hill: no Python eval nodes,
      no cartesian products (1-row totals ride broadcasts);
    - cusum: exactly ONE exchange feeds both stacked window projections;
    - q5: the star query keeps every dimension on BroadcastHashJoin;
    - spatial radius join: a plain equi-join (AQE-splittable), never
      BroadcastNestedLoop/cartesian.
    """
    from qudo_etl_pipeline_spark.catalog import registry

    specs = registry()
    names = [
        "winsorize_prices",
        "weighted_median_prices",
        "kaplan_meier_orders",
        "mann_whitney_quantity",
        "gini_user_activity",
        "hill_tail_user_activity",
        "cusum_hourly_drift",
        "q5_local_supplier_volume",
        "spatial_radius_pairs",
    ]
    plans = {
        n: _formatted(specs[n].spark(spark, SF_DIR)) for n in names
    }
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name

    assert "SortMergeJoin" not in plans["winsorize_prices"]
    assert "BroadcastHashJoin" in plans["winsorize_prices"]
    assert "SortMergeJoin" not in plans["q5_local_supplier_volume"]
    assert plans["q5_local_supplier_volume"].count(
        "BroadcastHashJoin"
    ) >= 2
    assert "BroadcastNestedLoopJoin" not in plans["spatial_radius_pairs"]
    # cusum: the stacked running-sum/running-min Window nodes must sit
    # DIRECTLY on one shared Exchange — consecutive Window lines with
    # the exchange immediately beneath, no re-shuffle between them
    cusum = plans["cusum_hourly_drift"]
    tree = cusum.split("\n\n")[0].splitlines()
    w_idx = [i for i, line in enumerate(tree) if "Window" in line]
    assert len(w_idx) >= 2, "expected stacked window projections"
    # Sort nodes between Windows are fine (same partitioning); an
    # Exchange inside the stack would be a re-shuffle regression
    between = tree[w_idx[0]: w_idx[-1] + 1]
    assert not any("Exchange" in line for line in between), between
    # ...and the node chain directly under the last Window must reach
    # an Exchange before any other Window/Join/Aggregate (one shared
    # shuffle feeds the whole stack)
    below = tree[w_idx[-1] + 1: w_idx[-1] + 3]
    assert any("Exchange" in line for line in below), below


def test_rank_statistics_have_no_single_task_data_window(spark):
    """Round-7 scale fix (the r6 verdict's one surviving scale-killer):
    KS / Mann-Whitney / Gini ECDF and rank running sums go through the
    range-partitioned two-pass prefix-sum device, so EVERY window over
    the data frame is partitioned by the physical partition id and the
    only unpartitioned ordered window runs on the partition-TOTALS
    frame (bounded by shuffle partition count, recognizable by its
    _pt_ columns). Hill needs no window at all (DECIMAL term sums).
    """
    from qudo_etl_pipeline_spark.catalog import registry

    specs = registry()
    for name in (
        "ks_test_totalprice",
        "ks_test_totalprice_binned",
        "mann_whitney_quantity",
        "gini_user_activity",
    ):
        plan = (
            specs[name]
            .spark(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        windows = [
            line
            for line in plan.splitlines()
            if "windowspecdefinition" in line
        ]
        assert windows, name
        for line in windows:
            assert (
                "windowspecdefinition(_pid#" in line or "_pt_" in line
            ), (name, line)
    hill = (
        specs["hill_tail_user_activity"]
        .spark(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition" not in hill


def test_ztest_projection_compiles_within_codegen_limits(spark):
    """Regression for the 64 KB Janino fallback: two_proportion_ztest's
    final projection used to re-inline the z expression tree through
    every ref_round argument reference and silently fall back to the
    interpreted path. With codegen fallback DISABLED, any method past
    the limit raises instead — so plain success here pins compiled
    whole-stage codegen for the whole plan."""
    from qudo_etl_pipeline_spark.operators.analytics import (
        two_proportion_ztest,
    )

    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        df = spark.range(1000).select(
            F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("g"),
            (F.col("id") % 7 == 0).cast("int").alias("s"),
        )
        row = two_proportion_ztest(df, "g", "s").collect()[0]
        assert row["n_a"] == 500 and row["n_b"] == 500
        assert row["z6"] is not None
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)


def test_round8_query_plan_shapes(spark):
    """Plan pins for the round-8 shapes: dimension broadcasts, scan-
    side pushdown, and no EvalPython anywhere."""
    from qudo_etl_pipeline_spark.catalog import registry

    specs = registry()
    d = "/root/testdata/sf0.001"

    # Q6: every predicate reaches the lineitem scan; no join at all
    plan = specs["q6_forecast_revenue"].spark(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "PushedFilters: [" in plan and "IsNotNull(l_shipdate)" in plan

    # Q7: both nation legs ride broadcasts; lineitem is the spine
    plan = specs["q7_nation_volume_shipping"].spark(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EvalPython" not in plan

    # Q10: nation broadcast + returnflag pushed to the lineitem scan
    plan = specs["q10_returned_item_reporting"].spark(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(l_returnflag,R)" in plan

    # Q22: anti join present, scalar subquery broadcast, no cartesian
    plan = specs["q22_global_sales_opportunity"].spark(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan

    # AUC: the device plan has no unpartitioned row-scaled window
    # (prefix-device property) and no Python crossing
    plan = specs["roc_auc_planted"].spark(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_profiled_join_broadcast_branch_plan(spark):
    """profiled_join's broadcast decision must materialize as a real
    BroadcastHashJoin in the executed plan."""
    from qudo_etl_pipeline_spark.plans.skew import profiled_join

    big = spark.range(5000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.lit("d").alias("tag")
    )
    joined, decision = profiled_join(big, dim, "k", broadcast_rows=1000)
    assert decision["strategy"] == "broadcast"
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_round9_q17_semi_join_pushdown(spark):
    """Q17's per-part average must aggregate ONLY brand-filtered
    partkeys (r8 verdict task 2): a LeftSemi join sits below the
    aggregate, the brand predicate reaches the part scan, and the
    aggregate's input is the semi-joined lineitem, not the full table.
    Q15's aggregate input is date-pruned at the scan — pinned too."""
    from qudo_etl_pipeline_spark.catalog import registry

    specs = registry()
    d = "/root/testdata/sf0.001"

    plan = specs["q17_small_quantity_revenue"].spark(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "EqualTo(p_brand,Brand#23)" in plan
    # the semi join must appear BELOW a partkey aggregate: the
    # aggregate over _pk is the only avg-building HashAggregate, and
    # its subtree must contain the LeftSemi (string containment on the
    # indented tree: LeftSemi appears after the partial _aq aggregate)
    assert plan.index("LeftSemi") > plan.index("HashAggregate")

    # Q15: the quarter filter reaches the lineitem scan below the
    # revenue aggregate (already pre-filtered; pin so it stays)
    plan = specs["q15_top_supplier"].spark(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(l_shipdate)" in plan
    assert "CartesianProduct" not in plan

    # Q22: the anti-join spine is date-pruned at the orders scan
    plan = specs["q22_global_sales_opportunity"].spark(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "IsNotNull(o_orderdate)" in plan or "GreaterThanOrEqual(o_orderdate" in plan


def test_round9_tpch_completion_plan_shapes(spark):
    """Plan pins for the eight round-9 TPC-H-completion shapes
    (Q2/Q8/Q9/Q11/Q12/Q16/Q20/Q21): dimension filters reach the
    parquet scans, dimension chains broadcast, exclusion/semi joins
    materialize as the right join type, and nothing crosses into
    Python or a cartesian product."""
    from qudo_etl_pipeline_spark.catalog import registry

    specs = registry()
    d = "/root/testdata/sf0.001"

    def plan_of(name: str) -> str:
        return (
            specs[name]
            .spark(spark, d)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    # Q2: size filter pushed to the part scan; region chain broadcast;
    # the min-cost join-back is an equi join, never a cartesian
    plan = plan_of("q2_min_cost_supplier")
    assert "EqualTo(p_size,15)" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    # Q8: both nation roles + region + part ride broadcasts (the only
    # shuffles are the fact spine and the year rollup)
    plan = plan_of("q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "EvalPython" not in plan

    # Q9: the mid-selectivity LIKE reaches the part scan as a
    # Contains pushdown
    plan = plan_of("q9_product_type_profit")
    assert "StringContains(p_name,widget)" in plan

    # Q11: the grand-total scalar subquery is a 1-row broadcast
    # nested-loop, NOT a cartesian product
    plan = plan_of("q11_important_stock")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan

    # Q12: the ship-year range prunes the lineitem scan
    plan = plan_of("q12_late_shipment_modes")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan

    # Q16: the negative-balance exclusion is a real anti join
    plan = plan_of("q16_supplier_part_variety")
    assert "LeftAnti" in plan

    # Q20: 'red%' prefix pushes as StartsWith; the supplier lift is a
    # semi join (no duplicate suppliers ever materialize)
    plan = plan_of("q20_promotion_suppliers")
    assert "StringStartsWith(p_name,red)" in plan
    assert "LeftSemi" in plan

    # Q21: the order-status filter reaches the orders scan; the whole
    # exists/not-exists rewrite stays JVM-side, no cartesian
    plan = plan_of("q21_waiting_suppliers")
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_round10_q2_q8_semi_join_pushdown(spark):
    """Round-10 plan fixes (r9 verdict tasks 2-3).

    Q2: the supply aggregate's input must be pruned by LeftSemi joins
    BELOW the groupBy (size-15 partkeys and EUROPE suppkeys), so the
    one fact-sized shuffle carries ~1/250 of lineitem — the code now
    matches its own docstring claim. Q8: the ECONOMY part semi join
    must sit BELOW the orders join (most-selective-first), so the
    fact spine shrinks before the first shuffle join.
    """
    from qudo_etl_pipeline_spark.catalog import registry

    specs = registry()
    d = "/root/testdata/sf0.001"

    def plan_of(name: str) -> str:
        return (
            specs[name]
            .spark(spark, d)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    # Q2: two semi joins (part keys, EUROPE supp keys) feed the
    # min-cost aggregate — in the top-down tree print they appear
    # AFTER (deeper than) the aggregate that consumes them
    plan = plan_of("q2_min_cost_supplier")
    assert plan.count("LeftSemi") >= 2
    agg_at = plan.index("min(l_extendedprice")
    assert plan.index("LeftSemi") > agg_at
    assert plan.index("LeftSemi", plan.index("LeftSemi") + 1) > agg_at
    assert "EqualTo(p_size,15)" in plan
    assert "EqualTo(r_name,EUROPE)" in plan

    # Q8: the part semi join is below (prints after) the orders join,
    # and the ECONOMY predicate reaches the part scan
    plan = plan_of("q8_market_share")
    assert "LeftSemi" in plan
    assert "EqualTo(p_type,ECONOMY)" in plan
    assert plan.index("LeftSemi") > plan.index("o_orderkey")
