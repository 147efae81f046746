"""Differential tests: ml/quality.py vs numpy mirrors of the
sklearn/statsmodels calls the reference makes (reference:
src/kraken/app/metrics.py:24-174,578-633)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.ml import quality as Q
from tests import reference_stats as R


@pytest.fixture(scope="module")
def clustered(spark):
    """Three well-separated 3-d blobs + labels, deterministic."""
    rng = np.random.default_rng(42)
    xs, labels = [], []
    for c, center in enumerate([(0, 0, 0), (5, 5, 0), (0, 8, 8)]):
        pts = rng.normal(loc=center, scale=1.0, size=(60, 3))
        xs.append(pts)
        labels += [c] * 60
    X = np.vstack(xs)
    labels = np.array(labels)
    rows = [
        (int(i), [float(v) for v in X[i]], int(labels[i]))
        for i in range(len(X))
    ]
    df = spark.createDataFrame(
        rows, "row_id: long, features: array<double>, prediction: int"
    )
    return df, X, labels


def test_cluster_sizes_and_balance(spark, clustered):
    df, _, labels = clustered
    sizes = {
        r["prediction"]: (r["n"], r["share"])
        for r in Q.cluster_sizes(df).collect()
    }
    assert sizes[0][0] == 60 and abs(sizes[0][1] - 1 / 3) < 1e-12
    assert Q.balance_ok(df)
    # degenerate: all rows one cluster -> share 1.0 outside (0.02, 0.55)
    assert not Q.balance_ok(df.withColumn("prediction", F.lit(0)))


def test_davies_bouldin_matches_numpy(spark, clustered):
    df, X, labels = clustered
    assert Q.davies_bouldin(df) == pytest.approx(
        R.davies_bouldin_np(X, labels), rel=1e-9
    )


def test_calinski_harabasz_matches_numpy(spark, clustered):
    df, X, labels = clustered
    assert Q.calinski_harabasz(df) == pytest.approx(
        R.calinski_harabasz_np(X, labels), rel=1e-9
    )


def test_degenerate_fallbacks(spark, clustered):
    df, _, _ = clustered
    one = df.withColumn("prediction", F.lit(0))
    assert Q.davies_bouldin(one) == 999.0
    assert Q.calinski_harabasz(one) == 0.0
    assert Q.silhouette_exact(one) == 0.0


def test_silhouette_exact_matches_numpy(spark, clustered):
    df, X, labels = clustered
    sub = df.filter(F.col("row_id") < 90)
    assert Q.silhouette_exact(sub) == pytest.approx(
        R.silhouette_np(X[:90], labels[:90]), rel=1e-9
    )


def test_silhouette_squared_orders_like_exact(spark, clustered):
    """The MLlib squared-silhouette scale path must at least agree in
    sign/ordering with the exact metric on clean vs random labels."""
    df, _, _ = clustered
    good = Q.silhouette_squared(df)
    rnd = df.withColumn(
        "prediction", F.floor(F.rand(7) * 3).cast("int")
    )
    bad = Q.silhouette_squared(rnd)
    assert good > 0.5 and good > bad


def test_adjusted_rand_index(spark, clustered):
    df, _, labels = clustered
    perm = df.withColumn(
        "perm", (F.col("prediction") + 1) % 3
    )
    assert Q.adjusted_rand_index(perm, "prediction", "perm") == pytest.approx(
        1.0
    )
    rng = np.random.default_rng(3)
    noisy = np.where(rng.random(len(labels)) < 0.3, rng.integers(0, 3, len(labels)), labels)
    rows = [(int(a), int(b)) for a, b in zip(labels, noisy)]
    two = spark.createDataFrame(rows, "a: int, b: int")
    assert Q.adjusted_rand_index(two, "a", "b") == pytest.approx(
        R.adjusted_rand_np(labels, noisy), rel=1e-9
    )


def test_cochrans_q_and_i2(spark):
    rng = np.random.default_rng(11)
    X = (rng.random((200, 4)) < [0.2, 0.5, 0.52, 0.8]).astype(int)
    # guard against the degenerate all-equal-rows case
    X[0] = [1, 0, 0, 0]
    df = spark.createDataFrame(
        [tuple(int(v) for v in row) for row in X], "c0: int, c1: int, c2: int, c3: int"
    )
    q, dof = Q.cochrans_q(df, ["c0", "c1", "c2", "c3"])
    q_np, dof_np = R.cochrans_q_np(X)
    assert dof == dof_np == 3
    assert q == pytest.approx(q_np, rel=1e-12)
    assert Q.i2_score(q, dof) == round((q - dof) / q * 100, 3)
    const = df.withColumn("c0", F.lit(1)).withColumn("c1", F.lit(1)) \
              .withColumn("c2", F.lit(1)).withColumn("c3", F.lit(1))
    with pytest.raises(ZeroDivisionError):
        Q.cochrans_q(const, ["c0", "c1", "c2", "c3"])


def test_rank_cluster_metrics_pandas_semantics(spark):
    """Replicates metrics.py:127-146 incl. average-tie ranks and the
    1.3x bic weight; winner by max rank_sum."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "run": ["a", "b", "c", "d"],
            "silhouette": [0.2, 0.5, 0.5, 0.1],
            "davies_bouldin": [1.5, 0.8, 2.0, 0.8],
            "calinski_harabasz": [10.0, 40.0, 30.0, 5.0],
            "bic": [100.0, 80.0, 90.0, 120.0],
            "aic": [95.0, 70.0, 85.0, 110.0],
        }
    )
    expect = pdf.copy()
    expect["silhouette_rank"] = expect["silhouette"].rank()
    expect["davies_bouldin_rank"] = expect["davies_bouldin"].rank(ascending=False)
    expect["calinski_harabasz_rank"] = expect["calinski_harabasz"].rank()
    expect["bic_rank"] = expect["bic"].rank(ascending=False) * 1.3
    expect["aic_rank"] = expect["aic"].rank(ascending=False)
    expect["rank_sum"] = expect[
        ["silhouette_rank", "davies_bouldin_rank", "calinski_harabasz_rank",
         "bic_rank", "aic_rank"]
    ].sum(axis=1)

    out = (
        Q.rank_cluster_metrics(
            spark.createDataFrame(pdf), information_criterions=True
        )
        .toPandas()
        .set_index("run")
    )
    for run in ["a", "b", "c", "d"]:
        for col in ["silhouette_rank", "davies_bouldin_rank", "bic_rank", "rank_sum"]:
            assert out.loc[run, col] == pytest.approx(
                expect.set_index("run").loc[run, col]
            ), (run, col)
    assert out["rank_sum"].idxmax() == expect.set_index("run")["rank_sum"].idxmax()


def test_cluster_quality_dict(spark, clustered):
    df, X, labels = clustered
    m = Q.cluster_quality(df, n_seed=42)
    assert m["n_clusters"] == 3
    assert m["davies_bouldin"] == pytest.approx(R.davies_bouldin_np(X, labels), rel=1e-9)
    assert m["calinski_harabasz"] == pytest.approx(
        R.calinski_harabasz_np(X, labels), rel=1e-9
    )
    assert set(m["cluster_proportions"]) == {0, 1, 2}
    assert sum(m["cluster_proportions"].values()) == pytest.approx(1.0)


def test_random_checker_ratios(spark, clustered):
    df, _, _ = clustered
    base = Q.cluster_quality(df)
    out = Q.random_checker(df, cluster_metrics=base, n_runs=2)
    # clean blobs must beat random labelings on every ratio
    assert out["calinski_harabasz_random_ratio"] > 1.0
    assert out["davies_bouldin_random_ratio"] > 1.0
    assert out["silhouette_random_ratio"] > 1.0


def test_random_checker_exact_values(spark, clustered):
    """Pin the seeded random-baseline path to EXACT metric values (the
    round-4 verdict's ask): replay the same F.rand(seed+i) labels the
    checker generates (deterministic for a fixed df/partitioning) and
    reproduce every ratio through the numpy mirrors — not just the
    >1.0 ordering."""
    df, X, _ = clustered
    base = Q.cluster_quality(df)
    out = Q.random_checker(df, cluster_metrics=base, n_runs=2)
    k = 3  # distinct planted predictions; checker draws from 0..k incl.
    sils, dbs, chs = [], [], []
    for i in range(2):
        lab = (
            df.withColumn(
                "_rl", F.floor(F.rand(42 + i) * (k + 1)).cast("int")
            )
            .select("row_id", "_rl")
            .toPandas()
        )
        labels = (
            lab.set_index("row_id").loc[range(len(X)), "_rl"].to_numpy()
        )
        assert len(np.unique(labels)) > 1  # non-degenerate draw
        sils.append(R.silhouette_squared_np(X, labels))
        dbs.append(R.davies_bouldin_np(X, labels))
        chs.append(R.calinski_harabasz_np(X, labels))
    assert out["calinski_harabasz_random_ratio"] == pytest.approx(
        base["calinski_harabasz"] / np.mean(chs), rel=1e-6
    )
    assert out["davies_bouldin_random_ratio"] == pytest.approx(
        np.mean(dbs) / base["davies_bouldin"], rel=1e-6
    )
    assert out["silhouette_random_ratio"] == pytest.approx(
        abs(base["silhouette"] / np.mean(sils)), rel=1e-6
    )


def test_label_consistency_exact_value(spark, clustered):
    """Pin label_consistency's seeded sampleBy path: replay the same
    stratified sample and reproduce the ARI in numpy exactly."""
    from qudo_etl_pipeline_spark.ml.signal import label_consistency

    df, _, _ = clustered

    def refit(train):
        def predict(frame):
            return frame.withColumn(
                "prediction", (F.col("row_id") % 4).cast("int")
            )

        return predict

    lc = label_consistency(df, refit)
    train = df.sampleBy(
        "prediction", {0: 0.9, 1: 0.9, 2: 0.9}, seed=42
    ).toPandas()
    assert len(train) > 0
    expect = R.adjusted_rand_np(
        train["prediction"].to_numpy(), (train["row_id"] % 4).to_numpy()
    )
    assert lc == pytest.approx(expect, rel=1e-12)


def test_cluster_quality_excludes_null_predictions(spark):
    """NULL prediction = unassigned: contributes to no quality metric
    and must not crash driver-side sorts (r11 NULL-salt sweep)."""
    from qudo_etl_pipeline_spark.ml import quality as Q

    rows = [
        (0, [0.0, 0.0], 0), (1, [0.1, 0.0], 0),
        (2, [5.0, 5.0], 1), (3, [5.1, 5.0], 1),
        (4, [9.9, 9.9], None),
    ]
    df = spark.createDataFrame(
        rows, "row_id long, features array<double>, prediction int"
    )
    m = Q.cluster_quality(df)
    assert m["n_clusters"] == 2
    assert set(m["cluster_proportions"]) == {0, 1}
    assert abs(sum(m["cluster_proportions"].values()) - 1.0) < 1e-12
    base = Q.cluster_quality(df.filter("prediction IS NOT NULL"))
    assert m["davies_bouldin"] == base["davies_bouldin"]
