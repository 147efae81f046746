"""Catalog entries for the ML layer (SURVEY §2.7).

Planted-label queries make the quality metrics oracle-checkable: a
deterministic "clustering" (l_returnflag / c_mktsegment / price bands)
stands in for model output, so Davies-Bouldin / Calinski-Harabasz /
silhouette / ARI / Cochran's Q reduce to closed-form SQL DuckDB can run.
Actual MLlib fits (seed-dependent, not SQL-expressible) are registered
without oracles -> the driver's weaker rows-only check (per the
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import load_table, none_last_key, register
from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql
from qudo_etl_pipeline_spark.ml import clustering as C
from qudo_etl_pipeline_spark.ml import features as FE
from qudo_etl_pipeline_spark.ml import quality as Q

# shared planted features: 3-d lineitem projection, cluster = l_returnflag
_LI_FEATS = """
    SELECT l_returnflag AS cl,
           l_quantity AS f1,
           l_extendedprice / 1000.0 AS f2,
           l_discount * 10.0 AS f3
    FROM lineitem
"""


def _lineitem_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_returnflag").alias("cl"),
        F.array(
            F.col("l_quantity").cast("double"),
            (F.col("l_extendedprice") / 1000.0).cast("double"),
            (F.col("l_discount") * 10.0).cast("double"),
        ).alias("features"),
    )


@register(
    "cluster_centroid_stats",
    oracle=f"""
    WITH s AS ({_LI_FEATS})
    SELECT cl AS cluster, COUNT(*) AS n,
           ROUND(AVG(f1), 6) AS c1, ROUND(AVG(f2), 6) AS c2,
           ROUND(AVG(f3), 6) AS c3,
           ROUND((SUM(f1*f1 + f2*f2 + f3*f3)
                  - COUNT(*) * (AVG(f1)*AVG(f1) + AVG(f2)*AVG(f2) + AVG(f3)*AVG(f3)))
                 / COUNT(*), 4) AS wss_mean
    FROM s GROUP BY cl
    """,
    survey_ids=["M14", "M15", "A4"],
    description="Per-cluster sufficient stats: n, centroid, mean within-SS",
)
def cluster_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = Q.cluster_stats(_lineitem_features(spark, sf_dir), pred="cl")
    return stats.select(
        F.col("cluster"),
        F.col("n"),
        F.round(F.col("centroid")[0], 6).alias("c1"),
        F.round(F.col("centroid")[1], 6).alias("c2"),
        F.round(F.col("centroid")[2], 6).alias("c3"),
        F.round(
            (
                F.col("ssn")
                - F.col("n")
                * F.aggregate(
                    F.col("centroid"), F.lit(0.0), lambda a, v: a + v * v
                )
            )
            / F.col("n"),
            4,
        ).alias("wss_mean"),
    )


@register(
    "calinski_harabasz_planted",
    oracle=f"""
    WITH s AS ({_LI_FEATS}),
    c AS (
      SELECT cl, COUNT(*) AS n, AVG(f1) AS m1, AVG(f2) AS m2, AVG(f3) AS m3,
             SUM(f1*f1 + f2*f2 + f3*f3) AS ssn
      FROM s GROUP BY cl
    ),
    g AS (
      SELECT SUM(n) AS n_tot, COUNT(*) AS k,
             SUM(n*m1)/SUM(n) AS g1, SUM(n*m2)/SUM(n) AS g2, SUM(n*m3)/SUM(n) AS g3
      FROM c
    )
    SELECT {ref_round_sql('''
      (SELECT SUM(n * ((m1-g1)*(m1-g1) + (m2-g2)*(m2-g2) + (m3-g3)*(m3-g3)))
         FROM c, g) / ((SELECT k FROM g) - 1)
      /
      ((SELECT SUM(ssn - n * (m1*m1 + m2*m2 + m3*m3)) FROM c)
         / ((SELECT n_tot FROM g) - (SELECT k FROM g)))''', 4)} AS calinski_harabasz
    """,
    survey_ids=["M15"],
    description="Calinski-Harabasz index over the planted lineitem clustering",
)
def calinski_harabasz_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = Q.calinski_harabasz(_lineitem_features(spark, sf_dir), pred="cl")
    return spark.createDataFrame(
        [(round(ch, 4),)], "calinski_harabasz: double"
    )


@register(
    "davies_bouldin_planted",
    oracle=f"""
    WITH s AS ({_LI_FEATS}),
    c AS (
      SELECT cl, COUNT(*) AS n, AVG(f1) AS m1, AVG(f2) AS m2, AVG(f3) AS m3
      FROM s GROUP BY cl
    ),
    sc AS (
      SELECT c.cl, c.m1, c.m2, c.m3,
             AVG(sqrt((s.f1-c.m1)*(s.f1-c.m1) + (s.f2-c.m2)*(s.f2-c.m2)
                      + (s.f3-c.m3)*(s.f3-c.m3))) AS scatter
      FROM s JOIN c ON s.cl = c.cl
      GROUP BY c.cl, c.m1, c.m2, c.m3
    )
    SELECT {ref_round_sql('AVG(worst)', 6)} AS davies_bouldin FROM (
      SELECT a.cl,
             MAX((a.scatter + b.scatter)
                 / sqrt((a.m1-b.m1)*(a.m1-b.m1) + (a.m2-b.m2)*(a.m2-b.m2)
                        + (a.m3-b.m3)*(a.m3-b.m3))) AS worst
      FROM sc a JOIN sc b ON a.cl <> b.cl
      GROUP BY a.cl
    )
    """,
    survey_ids=["M14"],
    description="Davies-Bouldin index over the planted lineitem clustering",
)
def davies_bouldin_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    db = Q.davies_bouldin(_lineitem_features(spark, sf_dir), pred="cl")
    return spark.createDataFrame([(round(db, 6),)], "davies_bouldin: double")


@register(
    "silhouette_exact_planted",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id, c_mktsegment AS cl,
             c_acctbal / 1000.0 AS f1, CAST(c_nationkey AS DOUBLE) AS f2
      FROM customer WHERE c_custkey <= 200
    ),
    pm AS (
      SELECT a.id AS ia, a.cl AS pa, b.cl AS pb,
             AVG(sqrt((a.f1-b.f1)*(a.f1-b.f1) + (a.f2-b.f2)*(a.f2-b.f2))) AS mdist
      FROM pts a JOIN pts b ON a.id <> b.id
      GROUP BY a.id, a.cl, b.cl
    ),
    pp AS (
      SELECT ia, pa,
             MAX(CASE WHEN pb = pa THEN mdist END) AS a_i,
             MIN(CASE WHEN pb <> pa THEN mdist END) AS b_i
      FROM pm GROUP BY ia, pa
    )
    SELECT ia AS row_id,
           ROUND(CASE WHEN a_i IS NULL OR b_i IS NULL THEN 0.0
                      ELSE (b_i - a_i) / GREATEST(a_i, b_i) END, 6) AS silhouette
    FROM pp
    """,
    survey_ids=["M13"],
    description="Per-point exact Euclidean silhouette on a planted clustering",
)
def silhouette_exact_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    df = cust.select(
        F.col("c_custkey").alias("row_id"),
        F.col("c_mktsegment").alias("cl"),
        F.array(
            (F.col("c_acctbal") / 1000.0).cast("double"),
            F.col("c_nationkey").cast("double"),
        ).alias("features"),
    )
    pts = Q.silhouette_pointwise(df, pred="cl", id_col="row_id")
    return pts.select(
        "row_id", F.round("silhouette", 6).alias("silhouette")
    )


@register(
    "ari_planted",
    oracle=f"""
    WITH lab AS (
      SELECT o_orderpriority AS a,
             CAST(FLOOR(o_totalprice / 60000.0) AS BIGINT) AS b
      FROM orders
    ),
    cont AS (SELECT a, b, COUNT(*) AS nij FROM lab GROUP BY a, b),
    s AS (
      SELECT SUM(nij*(nij-1)/2.0) AS sum_nij2, SUM(nij) AS n FROM cont
    ),
    sa AS (SELECT SUM(ai*(ai-1)/2.0) AS sum_ai2 FROM
           (SELECT SUM(nij) AS ai FROM cont GROUP BY a)),
    sb AS (SELECT SUM(bj*(bj-1)/2.0) AS sum_bj2 FROM
           (SELECT SUM(nij) AS bj FROM cont GROUP BY b))
    SELECT {ref_round_sql('''
      (s.sum_nij2 - sa.sum_ai2 * sb.sum_bj2 / (s.n*(s.n-1)/2.0))
      / ((sa.sum_ai2 + sb.sum_bj2) / 2.0
         - sa.sum_ai2 * sb.sum_bj2 / (s.n*(s.n-1)/2.0))''', 6)} AS ari
    FROM s, sa, sb
    """,
    survey_ids=["M19"],
    description="Adjusted Rand index (closed form) between two planted labelings",
)
def ari_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("a"),
        F.floor(F.col("o_totalprice") / 60000.0).cast("long").alias("b"),
    )
    ari = Q.adjusted_rand_index(lab, "a", "b")
    return spark.createDataFrame([(round(ari, 6),)], "ari: double")


@register(
    "cochrans_q_planted",
    oracle=f"""
    WITH b AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS b0,
             CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS b1,
             CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS b2,
             CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS b3
      FROM lineitem
    ),
    agg AS (
      SELECT SUM(b0) AS t0, SUM(b1) AS t1, SUM(b2) AS t2, SUM(b3) AS t3,
             SUM(b0+b1+b2+b3) AS n,
             SUM((b0+b1+b2+b3)*(b0+b1+b2+b3)) AS sum_r2
      FROM b
    )
    SELECT {ref_round_sql('''(4-1) * (4.0*(t0*t0 + t1*t1 + t2*t2 + t3*t3) - CAST(n AS DOUBLE)*n)
                 / (4.0*n - sum_r2)''', 6)} AS q,
           CAST(3 AS BIGINT) AS dof,
           {ref_round_sql('''((4-1) * (4.0*(t0*t0 + t1*t1 + t2*t2 + t3*t3) - CAST(n AS DOUBLE)*n)
                  / (4.0*n - sum_r2) - 3)
                 / ((4-1) * (4.0*(t0*t0 + t1*t1 + t2*t2 + t3*t3) - CAST(n AS DOUBLE)*n)
                    / (4.0*n - sum_r2)) * 100''', 3)} AS i2
    FROM agg
    """,
    survey_ids=["M32"],
    description="Cochran's Q + I^2 over planted binary treatment columns",
)
def cochrans_q_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # when/otherwise(0), not bool.cast(int): Cochran's Q needs COMPLETE
    # binary blocks, so an unknown (NULL) answer is a 0/No on BOTH
    # engines — a bare cast would carry NULL into the block sums and
    # silently diverge from the oracle's CASE ... ELSE 0
    def b(cond):
        return F.when(cond, 1).otherwise(0)

    li = load_table(spark, sf_dir, "lineitem").select(
        b(F.col("l_returnflag") == "R").alias("b0"),
        b(F.col("l_linestatus") == "F").alias("b1"),
        b(F.col("l_discount") > 0.05).alias("b2"),
        b(F.col("l_quantity") > 25).alias("b3"),
    )
    q, dof = Q.cochrans_q(li, ["b0", "b1", "b2", "b3"])
    i2 = Q.i2_score(q, dof)
    return spark.createDataFrame(
        [(round(q, 6), dof, i2)], "q: double, dof: bigint, i2: double"
    )


@register(
    "rank_sum_selection",
    oracle="""
    WITH m AS (
      SELECT s_nationkey AS nation,
             CAST(COUNT(*) AS DOUBLE) AS silhouette,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS davies_bouldin,
             CAST(MAX(s_acctbal) AS DOUBLE) AS calinski_harabasz
      FROM supplier GROUP BY s_nationkey
    ),
    r AS (
      SELECT nation,
             RANK() OVER (ORDER BY silhouette ASC)
               + (COUNT(*) OVER (PARTITION BY silhouette) - 1) / 2.0 AS silhouette_rank,
             RANK() OVER (ORDER BY davies_bouldin DESC)
               + (COUNT(*) OVER (PARTITION BY davies_bouldin) - 1) / 2.0 AS davies_bouldin_rank,
             RANK() OVER (ORDER BY calinski_harabasz ASC)
               + (COUNT(*) OVER (PARTITION BY calinski_harabasz) - 1) / 2.0 AS calinski_harabasz_rank
      FROM m
    )
    SELECT CAST(nation AS BIGINT) AS nation, silhouette_rank, davies_bouldin_rank,
           calinski_harabasz_rank,
           silhouette_rank + davies_bouldin_rank + calinski_harabasz_rank AS rank_sum
    FROM r
    """,
    survey_ids=["W1", "A10"],
    description="Rank-sum model selection with pandas average-tie semantics",
)
def rank_sum_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    m = sup.groupBy(F.col("s_nationkey").cast("long").alias("nation")).agg(
        F.count(F.lit(1)).cast("double").alias("silhouette"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("davies_bouldin"),
        F.max("s_acctbal").cast("double").alias("calinski_harabasz"),
    )
    return Q.rank_cluster_metrics(m).select(
        "nation",
        "silhouette_rank",
        "davies_bouldin_rank",
        "calinski_harabasz_rank",
        "rank_sum",
    )


@register(
    "label_encode_codes",
    oracle="""
    -- NULL has no code (sklearn LabelEncoder fits post-fillna values;
    -- build_code_maps excludes None) — DuckDB ranks NULL last, so the
    -- non-null codes are unchanged by the CASE
    SELECT p_brand AS value,
           CASE WHEN p_brand IS NULL THEN NULL
                ELSE CAST(DENSE_RANK() OVER (ORDER BY p_brand) - 1
                          AS BIGINT) END AS code
    FROM (SELECT DISTINCT p_brand FROM part)
    """,
    survey_ids=["M1"],
    description="LabelEncoder parity: sorted-distinct-value codes",
)
def label_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    enc = FE.label_encode(part, ["p_brand"], suffix="__code")
    return (
        enc.select(
            F.col("p_brand").alias("value"),
            F.col("p_brand__code").cast("long").alias("code"),
        )
        .distinct()
    )


@register(
    "standardize_zscore",
    oracle="""
    WITH s AS (
      SELECT c_mktsegment,
             (c_acctbal - AVG(c_acctbal) OVER ()) / STDDEV_POP(c_acctbal) OVER () AS z
      FROM customer
    )
    SELECT c_mktsegment, COUNT(*) AS n, ROUND(AVG(z), 6) AS mean_z
    FROM s GROUP BY c_mktsegment
    """,
    survey_ids=["M2"],
    description="Population-std z-score (sklearn StandardScaler parity)",
)
def standardize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    scaled, _ = FE.standardize(cust, ["c_acctbal"])
    return scaled.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("c_acctbal"), 6).alias("mean_z"),
    )


@register(
    "kmeans_assign_fixed",
    oracle="""
    WITH s AS (
      SELECT l_quantity AS f1, l_extendedprice / 1000.0 AS f2, l_discount * 10.0 AS f3
      FROM lineitem
    ),
    d AS (
      SELECT sqrt((f1-10)*(f1-10) + (f2-20)*(f2-20) + (f3-0.2)*(f3-0.2)) AS d0,
             sqrt((f1-25)*(f1-25) + (f2-50)*(f2-50) + (f3-0.5)*(f3-0.5)) AS d1,
             sqrt((f1-40)*(f1-40) + (f2-80)*(f2-80) + (f3-0.8)*(f3-0.8)) AS d2
      FROM s
    )
    SELECT CASE WHEN d0 <= d1 AND d0 <= d2 THEN 0
                WHEN d1 <= d2 THEN 1 ELSE 2 END AS cluster,
           COUNT(*) AS n,
           ROUND(AVG(LEAST(d0, d1, d2)), 4) AS mean_dist
    FROM d GROUP BY 1
    """,
    survey_ids=["M4"],
    description="KMeans assignment step against fixed literal centroids",
)
def kmeans_assign_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _lineitem_features(spark, sf_dir)
    cents = [[10.0, 20.0, 0.2], [25.0, 50.0, 0.5], [40.0, 80.0, 0.8]]
    dists = [
        F.sqrt(
            Q._sq_dist(
                F.col("features"),
                F.array(*[F.lit(v) for v in c]),
            )
        ).alias(f"d{i}")
        for i, c in enumerate(cents)
    ]
    d = feats.select(*dists)
    cluster = (
        F.when((F.col("d0") <= F.col("d1")) & (F.col("d0") <= F.col("d2")), 0)
        .when(F.col("d1") <= F.col("d2"), 1)
        .otherwise(2)
    )
    return (
        d.select(
            cluster.alias("cluster"),
            F.least("d0", "d1", "d2").alias("dmin"),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("dmin"), 4).alias("mean_dist"),
        )
    )


# ---- MLlib fits: seed-dependent, not SQL-expressible -> rows-only ----


@register(
    "kmeans_embeddings",
    oracle=None,
    survey_ids=["M4", "M16"],
    description="Multi-seed KMeans on the embeddings table; best-by-rank-sum "
    "cluster sizes (rows-only check: MLlib k-means|| is seed- but not "
    "SQL-reproducible)",
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("features"),
        "label",
    )
    fit = C.kmeans_multi_seed(emb, k=4, seeds=[1, 42, 100], max_workers=3)
    if fit is None:
        return spark.createDataFrame([], "prediction: int, n: bigint")
    return (
        fit["labels"]
        .groupBy("prediction")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prediction")
    )


@register(
    "optimal_k_embeddings",
    oracle=None,
    survey_ids=["M11", "M12"],
    description="Optimal-k search (elbow + rank-sum) on embeddings (rows-only)",
)
def optimal_k_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("features")
    )
    best = C.optimal_k(emb, ks=[3, 4, 5, 6], seed=42, max_workers=2)
    return spark.createDataFrame([(best,)], "best_k: bigint")


@register(
    "gmm_pca_embeddings",
    oracle=None,
    survey_ids=["M3", "M7"],
    description="PCA (cum-var component pick) + GaussianMixture with manual "
    "BIC/AIC on embeddings (rows-only)",
)
def gmm_pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("features")
    )
    proj, n_comp = FE.pca_transform(emb, n_components=8)
    fit = C.gmm_fit(proj, k=4, seed=42)
    if fit is None:
        return spark.createDataFrame(
            [], "n_components: bigint, k: bigint, n_clusters_found: bigint"
        )
    found = fit["labels"].select("prediction").distinct().count()
    return spark.createDataFrame(
        [(n_comp, 4, found)],
        "n_components: bigint, k: bigint, n_clusters_found: bigint",
    )


@register(
    "kmodes_step_planted",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id, c_mktsegment AS a0,
             CAST(c_nationkey % 5 AS VARCHAR) AS a1
      FROM customer
    ),
    assigned AS (
      SELECT id, a0, a1,
             CASE WHEN (CASE WHEN a0 = 'BUILDING' THEN 0 ELSE 1 END
                        + CASE WHEN a1 = '0' THEN 0 ELSE 1 END)
                       <= (CASE WHEN a0 = 'MACHINERY' THEN 0 ELSE 1 END
                           + CASE WHEN a1 = '3' THEN 0 ELSE 1 END)
                  THEN 0 ELSE 1 END AS cluster
      FROM pts
    ),
    m0 AS (
      SELECT cluster, a0 AS mode_a0 FROM (
        SELECT cluster, a0, ROW_NUMBER() OVER (
          PARTITION BY cluster
          ORDER BY COUNT(*) DESC, a0 ASC NULLS FIRST) AS rn
        FROM assigned GROUP BY cluster, a0
      ) WHERE rn = 1
    ),
    m1 AS (
      SELECT cluster, a1 AS mode_a1 FROM (
        SELECT cluster, a1, ROW_NUMBER() OVER (
          PARTITION BY cluster ORDER BY COUNT(*) DESC, a1 ASC) AS rn
        FROM assigned GROUP BY cluster, a1
      ) WHERE rn = 1
    )
    SELECT n.cluster, n.n, m0.mode_a0, m1.mode_a1
    FROM (SELECT cluster, COUNT(*) AS n FROM assigned GROUP BY cluster) n
    JOIN m0 ON n.cluster = m0.cluster
    JOIN m1 ON n.cluster = m1.cluster
    """,
    survey_ids=["M5", "A6"],
    description="One KModes assign+update step against fixed literal modes",
)
def kmodes_step_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml import kmodes as KM

    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("row_id"),
        F.col("c_mktsegment").alias("a0"),
        (F.col("c_nationkey") % 5).cast("string").alias("a1"),
    )
    modes = [{"a0": "BUILDING", "a1": "0"}, {"a0": "MACHINERY", "a1": "3"}]
    assigned = KM._assign(pts, modes, ["a0", "a1"], [], 0.0)
    new_modes = KM._update_modes(assigned, modes, ["a0", "a1"], [])
    sizes = assigned.groupBy(F.col("prediction").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n")
    )
    mode_rows = spark.createDataFrame(
        [(i, m["a0"], m["a1"]) for i, m in enumerate(new_modes)],
        "cluster: int, mode_a0: string, mode_a1: string",
    )
    return sizes.join(mode_rows, "cluster")


@register(
    "kprototypes_step_planted",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id, c_mktsegment AS a0,
             CAST(c_acctbal AS DOUBLE) / 1000.0 AS f1
      FROM customer
    ),
    assigned AS (
      -- argmin with lowest-index DEFAULT: the operator's
      -- when(d1 < d0, 1).otherwise(0) sends a NULL distance (NULL f1)
      -- to cluster 0, so the comparison is written d1 < d0 -> 1
      -- (NULL -> ELSE 0), not d0 <= d1 -> 0 (NULL -> ELSE 1)
      SELECT id, a0, f1,
             CASE WHEN ((f1 - 5.0) * (f1 - 5.0)
                        + 0.5 * (CASE WHEN a0 = 'MACHINERY' THEN 0 ELSE 1 END))
                       < ((f1 - 0.0) * (f1 - 0.0)
                          + 0.5 * (CASE WHEN a0 = 'BUILDING' THEN 0 ELSE 1 END))
                  THEN 1 ELSE 0 END AS cluster
      FROM pts
    ),
    m0 AS (
      SELECT cluster, a0 AS mode_a0 FROM (
        SELECT cluster, a0, ROW_NUMBER() OVER (
          PARTITION BY cluster
          ORDER BY COUNT(*) DESC, a0 ASC NULLS FIRST) AS rn
        FROM assigned GROUP BY cluster, a0
      ) WHERE rn = 1
    )
    SELECT n.cluster, n.n, m0.mode_a0, n.new_f1
    FROM (
      SELECT cluster, COUNT(*) AS n, {ref_round_sql('AVG(f1)', 6)} AS new_f1
      FROM assigned GROUP BY cluster
    ) n JOIN m0 ON n.cluster = m0.cluster
    """,
    survey_ids=["M6", "A6", "A8"],
    description="One KPrototypes assign+update step: mixed "
    "sq_euclid + gamma*hamming distance against fixed prototypes",
)
def kprototypes_step_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml import kmodes as KM

    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("row_id"),
        F.col("c_mktsegment").alias("a0"),
        (F.col("c_acctbal").cast("double") / 1000.0).alias("f1"),
    )
    protos = [{"a0": "BUILDING", "f1": 0.0}, {"a0": "MACHINERY", "f1": 5.0}]
    assigned = KM._assign(pts, protos, ["a0"], ["f1"], gamma=0.5)
    new_protos = KM._update_modes(assigned, protos, ["a0"], ["f1"])
    sizes = assigned.groupBy(F.col("prediction").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n")
    )
    proto_rows = spark.createDataFrame(
        [(i, m["a0"], round(m["f1"], 6)) for i, m in enumerate(new_protos)],
        "cluster: int, mode_a0: string, new_f1: double",
    )
    return sizes.join(proto_rows, "cluster")


@register(
    "kmodes_documents",
    oracle=None,
    survey_ids=["M5", "M6"],
    description="Full deterministic KModes fit (Cao init, Lloyd loop) on "
    "document metadata (rows-only: the iterative loop is not "
    "SQL-expressible)",
)
def kmodes_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml import kmodes as KM

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("row_id"),
        F.col("lang").alias("a0"),
        F.col("source").alias("a1"),
        (F.col("n_chars") > 200).cast("string").alias("a2"),
    )
    fit = KM.kmodes_fit(docs, ["a0", "a1", "a2"], k=3)
    return (
        fit["labels"]
        .groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )


@register(
    "lca_documents",
    oracle=None,
    survey_ids=["M8"],
    description="Multinomial-mixture EM (LCA) class sizes on document "
    "metadata (rows-only: iterative EM)",
)
def lca_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml import lca as LCA

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("row_id"),
        F.col("lang").alias("a0"),
        F.col("source").alias("a1"),
        (F.col("n_chars") > 200).cast("string").alias("a2"),
    )
    fit = LCA.lca_fit(docs, ["a0", "a1", "a2"], k=3, seed=42, max_iter=30)
    return (
        fit["labels"]
        .groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )


@register(
    "elbow_curve_embeddings",
    oracle=None,
    survey_ids=["M11", "M12"],
    description="Elbow finder over the kmeans cost curve (k in 2..6) on "
    "embeddings: per-k inertia + the max-perpendicular-distance elbow "
    "flag (rows-only: iterative kmeans training)",
)
def elbow_curve_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:

    feats = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("row_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    ).cache()
    ks = [2, 3, 4, 5, 6]
    costs = [
        C.kmeans_fit(feats, k=k, seed=42)["inertia"] for k in ks
    ]
    feats.unpersist()
    elbow = C.elbow_index(costs)
    return spark.createDataFrame(
        [
            (k, round(c, 3), int(i == elbow))
            for i, (k, c) in enumerate(zip(ks, costs))
        ],
        "k: bigint, cost: double, is_elbow: bigint",
    )


def _kmeans_refit(train):
    """Shared train->scorer closure for both consistency queries —
    one definition so the two metrics can never silently diverge."""
    model = C.kmeans_fit(
        train.select("row_id", "features"), k=3, seed=42
    )["model"]

    def predict(test):
        from qudo_etl_pipeline_spark.ml.clustering import _to_vec

        return model.transform(_to_vec(test, "features")).drop("_v")

    return predict


@register(
    "model_consistency_rows",
    oracle=None,
    survey_ids=["M18", "M19"],
    description="Model consistency: stratified 90/10 split, kmeans refit "
    "on train, ARI of refit predictions vs original labels on the test "
    "slice (rows-only: iterative refit)",
)
def model_consistency_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml.signal import model_consistency

    feats = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("row_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    base = C.kmeans_fit(feats, k=3, seed=42)["labels"].cache()

    ari = model_consistency(base, _kmeans_refit)
    base.unpersist()
    return spark.createDataFrame(
        [(round(float(ari), 6),)], "model_consistency_ari: double"
    )


@register(
    "label_consistency_rows",
    oracle=None,
    survey_ids=["M20", "M19"],
    description="Label consistency: kmeans refit on a stratified 90% "
    "sample, ARI of refit labels vs originals on that sample "
    "(rows-only: iterative refit)",
)
def label_consistency_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml.signal import label_consistency

    feats = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("row_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    base = C.kmeans_fit(feats, k=3, seed=42)["labels"].cache()

    ari = label_consistency(base, _kmeans_refit)
    base.unpersist()
    return spark.createDataFrame(
        [(round(float(ari), 6),)], "label_consistency_ari: double"
    )


@register(
    "lca_mixed_documents",
    oracle=None,
    survey_ids=["M8"],
    description="Mixed-type LCA (depmixS4-mix parity: multinomial + "
    "gaussian factors) class sizes on document metadata (rows-only: "
    "iterative EM)",
)
def lca_mixed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml import lca as LCA

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("row_id"),
        F.col("lang").alias("a0"),
        F.col("source").alias("a1"),
        F.col("n_chars").cast("double").alias("x0"),
        F.length("text").cast("double").alias("x1"),
    )
    fit = LCA.lca_fit(
        docs, ["a0", "a1"], k=3, seed=42, max_iter=30, num_cols=["x0", "x1"]
    )
    return (
        fit["labels"]
        .groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )


@register(
    "uniqueness_planted",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT l_returnflag AS seg,
             l_linestatus || '|' || CAST(CAST(l_quantity / 10 AS INT) AS VARCHAR) AS pair
      FROM lineitem
    ),
    dup AS (
      SELECT pair, CASE WHEN COUNT(DISTINCT seg) > 1 THEN 1 ELSE 0 END AS dup
      FROM pairs GROUP BY pair
    )
    SELECT seg, {ref_round_sql('1 - CAST(SUM(d.dup) AS DOUBLE) / COUNT(*)', 6)} AS uniqueness
    FROM pairs p JOIN dup d ON p.pair = d.pair
    GROUP BY seg
    """,
    survey_ids=["M28", "J3"],
    description="Uniqueness: 1 - share of (q_code,category) pairs shared "
    "with any other segment",
)
def uniqueness_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml import business as B

    li = load_table(spark, sf_dir, "lineitem")
    deliver = li.select(
        F.col("l_returnflag").alias("targeting_seg"),
        F.col("l_linestatus").alias("q_code"),
        F.array(
            (F.col("l_quantity") / 10).cast("int").cast("string")
        ).alias("sig_more_category"),
    ).distinct()
    u = B.uniqueness(deliver)
    return spark.createDataFrame(
        [(seg, round(val, 6))
         for seg, val in sorted(u.items(), key=lambda kv: none_last_key(kv[0]))],
        "seg: string, uniqueness: double",
    )


@register(
    "classification_metrics_planted",
    oracle="""
    WITH scored AS (
      SELECT l_returnflag AS label,
             CASE WHEN l_quantity > 25 THEN 'R' ELSE 'A' END AS pred
      FROM lineitem
    ),
    -- NULL truth or NULL prediction is unscoreable (mirrors
    -- signal.classification_metrics' confusion-matrix exclusion)
    conf AS (SELECT label, pred, COUNT(*) AS n FROM scored
             WHERE label IS NOT NULL AND pred IS NOT NULL
             GROUP BY label, pred),
    tot AS (SELECT SUM(n) AS n FROM conf),
    per AS (
      SELECT l.label,
             l.actual,
             COALESCE(p.predicted, 0) AS predicted,
             COALESCE(t.tp, 0) AS tp
      FROM (SELECT label, SUM(n) AS actual FROM conf GROUP BY label) l
      LEFT JOIN (SELECT pred, SUM(n) AS predicted FROM conf GROUP BY pred) p
        ON l.label = p.pred
      LEFT JOIN (SELECT label, n AS tp FROM conf WHERE label = pred) t
        ON l.label = t.label
    ),
    w AS (
      SELECT
        (SELECT CAST(SUM(tp) AS DOUBLE) / (SELECT n FROM tot) FROM per) AS acc,
        (SELECT SUM(actual * CASE WHEN predicted > 0 THEN CAST(tp AS DOUBLE)/predicted ELSE 0 END)
           / (SELECT n FROM tot) FROM per) AS prec_w,
        (SELECT SUM(actual * CAST(tp AS DOUBLE)/actual) / (SELECT n FROM tot) FROM per) AS rec_w,
        (SELECT SUM(actual *
            CASE WHEN (CASE WHEN predicted > 0 THEN CAST(tp AS DOUBLE)/predicted ELSE 0 END
                       + CAST(tp AS DOUBLE)/actual) > 0
                 THEN 2 * (CASE WHEN predicted > 0 THEN CAST(tp AS DOUBLE)/predicted ELSE 0 END)
                        * (CAST(tp AS DOUBLE)/actual)
                      / ((CASE WHEN predicted > 0 THEN CAST(tp AS DOUBLE)/predicted ELSE 0 END)
                         + CAST(tp AS DOUBLE)/actual)
                 ELSE 0 END)
           / (SELECT n FROM tot) FROM per) AS f1_w,
        (SELECT SUM(CAST(actual AS DOUBLE) * predicted) / ((SELECT n FROM tot) * (SELECT n FROM tot))
           FROM per) AS pe
    )
    SELECT ROUND(acc, 3) AS signal,
           ROUND(f1_w, 3) AS f1_score,
           ROUND(prec_w, 3) AS precision,
           ROUND(rec_w, 3) AS recall_score,
           ROUND((acc - pe) / (1 - pe), 3) AS cohen_kappa_score
    FROM w
    """,
    survey_ids=["M33"],
    description="Weighted classification metrics + Cohen's kappa from a "
    "planted confusion matrix",
)
def classification_metrics_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml import signal as S

    scored = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("label"),
        F.when(F.col("l_quantity") > 25, "R").otherwise("A").alias("pred"),
    )
    m = S.classification_metrics(scored, "label", "pred")
    return spark.createDataFrame(
        [(m["signal"], m["f1_score"], m["precision"], m["recall_score"],
          m["cohen_kappa_score"])],
        "signal: double, f1_score: double, precision: double, "
        "recall_score: double, cohen_kappa_score: double",
    )


@register(
    "communicability_planted",
    oracle="""
    SELECT c_mktsegment AS seg,
           CAST(COUNT(DISTINCT c_name) AS BIGINT) AS communicability
    FROM customer
    WHERE regexp_matches(c_name, '7|13')
    GROUP BY c_mktsegment
    """,
    survey_ids=["M29", "A7"],
    description="Communicability: distinct regex-matching codes per segment",
)
def communicability_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml import business as B

    deliver = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("targeting_seg"),
        F.col("c_name").alias("q_code"),
    )
    c = B.communicability(deliver, pattern="7|13")
    return spark.createDataFrame(
        [(seg, int(n))
         for seg, n in sorted(c["data"].items(), key=lambda kv: none_last_key(kv[0]))],
        "seg: string, communicability: bigint",
    )


@register(
    "signal_loss_rf",
    oracle=None,
    survey_ids=["M33", "M18"],
    description="RandomForest signal-loss on planted tgt features "
    "(rows-only: MLlib RF is seed- but not SQL-reproducible)",
)
def signal_loss_rf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml import signal as S

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") > 25).cast("int").alias("q1_tgt"),
        (F.col("l_discount") > 0.05).cast("int").alias("q2_tgt"),
        (F.col("l_tax") > 0.04).cast("int").alias("q3_tgt"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("prediction"),
    )
    out = S.signal_loss(li, ["q1_tgt", "q2_tgt", "q3_tgt"])
    rows = [
        (k, v["signal"], v["f1_score"], v["precision"], v["recall_score"],
         v["cohen_kappa_score"])
        for k, v in sorted(out.items(), key=lambda kv: none_last_key(kv[0]))
    ]
    return spark.createDataFrame(
        rows,
        "segment: string, signal: double, f1_score: double, precision: double, "
        "recall_score: double, cohen_kappa_score: double",
    )


@register(
    "equidepth_price_buckets",
    oracle="""
    WITH b AS (
      -- price IS NOT NULL mirrors the bucketizer's NULL-value drop
      SELECT l_extendedprice AS v,
             NTILE(8) OVER (ORDER BY l_extendedprice,
                            l_orderkey, l_linenumber) AS bucket
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
           MIN(v) AS lo, MAX(v) AS hi
    FROM b GROUP BY bucket
    """,
    survey_ids=["M2", "A8", "W3"],
    description="Equi-depth discretization summarized per bucket, "
    "size-dispatched (r8 verdict task 5): EXACT NTILE over a "
    "deterministic total order up to 2M input rows (every oracle-"
    "gated SF), the map-only approx-boundary sketch path above "
    "(tolerance-tested against exact, the heaviest device ratio "
    "retired from SCALING.md)",
)
def equidepth_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.ml.discretize import auto_bucketize

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    b = auto_bucketize(
        li, "l_extendedprice", 8, ["l_orderkey", "l_linenumber"]
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )


def _te_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.hashing import hash64_sql
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    h = hash64_sql("('fold:0:' || CAST(o_orderkey AS VARCHAR))")
    gmean = "CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)"
    te = (
        f"(CAST(os AS DOUBLE) + 20.0 * ({gmean}))"
        f" / (CAST(onn AS DOUBLE) + 20.0)"
    )
    return f"""
    WITH src AS (
      -- CAST(bool), not CASE-ELSE-0: a NULL price is an UNKNOWN label
      -- and the encoder drops unlabeled rows (they can neither
      -- contribute statistics nor be scored) — r11 NULL-salt parity
      SELECT o_orderkey AS id, o_orderpriority AS c,
             CAST(o_totalprice > 150000 AS BIGINT) AS t,
             ({h} % 5) AS f
      FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    cells AS (
      SELECT c, f, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS s
      FROM src GROUP BY c, f
    ),
    per_cat AS (
      SELECT c, CAST(SUM(n) AS BIGINT) AS cn,
             CAST(SUM(s) AS BIGINT) AS cs
      FROM cells GROUP BY c
    ),
    gtot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS gn,
             CAST(SUM(s) AS BIGINT) AS gs
      FROM cells
    ),
    stats AS (
      SELECT cells.c, cells.f,
             (cn - n) AS onn, (cs - s) AS os, gn, gs
      FROM cells JOIN per_cat ON cells.c = per_cat.c CROSS JOIN gtot
    )
    -- LEFT JOIN + global-mean fallback mirrors the encoder: a NULL
    -- category/fold never equi-matches its stats cell (the join is
    -- null-UNSAFE on both engines by design), so those rows encode to
    -- the smoothed-empty value = global mean
    SELECT src.id AS o_orderkey, src.c AS o_orderpriority,
           src.f AS fold, src.t AS converted,
           COALESCE({ref_round_sql(te, 6)},
                    (SELECT {ref_round_sql(gmean, 6)} FROM gtot)) AS te6
    FROM src LEFT JOIN stats ON src.c = stats.c AND src.f = stats.f
    """


@register(
    "target_encoding_oof_orders",
    oracle=_te_oracle(),
    survey_ids=["M1", "J5", "A5"],
    description="K-fold out-of-fold target encoding of order priority "
    "against a planted conversion label: per-row encodings use ONLY "
    "the other folds' statistics (total-minus-own-fold on the exact "
    "integer cell frame, one groupBy) with additive smoothing toward "
    "the global mean - the leakage-safe high-cardinality encoder; "
    "fold = pure-row-function hash, no shuffle for assignment",
)
def target_encoding_oof_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice") > 150000).cast("bigint").alias("converted"),
    )
    return FE.target_encode_oof(
        orders,
        "o_orderkey",
        "o_orderpriority",
        "converted",
        n_folds=5,
        smoothing=20,
        seed=0,
    )


def _hashed_oracle(n: int = 64) -> str:
    from qudo_etl_pipeline_spark.functions.hashing import hash64_sql

    parts = []
    for c in ("o_orderstatus", "o_orderpriority"):
        h = hash64_sql(f"('feat:{c}:' || CAST({c} AS VARCHAR))")
        parts.append(f"""
      SELECT o_orderkey, '{c}' AS col_name,
             ({h} % {n}) AS feature_index,
             CAST(CASE WHEN ({h} % {2 * n}) < {n} THEN 1 ELSE -1 END
                  AS BIGINT) AS sign
      FROM orders WHERE {c} IS NOT NULL""")
    return " UNION ALL ".join(parts)


@register(
    "hashed_features_orders",
    oracle=_hashed_oracle(),
    survey_ids=["M1", "P10"],
    description="The hashing trick (Weinberger ICML'09) over two "
    "categorical order columns onto a fixed 64-dim space: signed "
    "index from the shared md5-prefix hash, sign bit via the exact "
    "h mod 2n < n identity (pure BIGINT - no lossy double division), "
    "map-only with no vocabulary state; long-form output a sparse "
    "assembler consumes directly",
)
def hashed_features_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return FE.hashed_features(
        orders,
        "o_orderkey",
        ["o_orderstatus", "o_orderpriority"],
        n_features=64,
    )
