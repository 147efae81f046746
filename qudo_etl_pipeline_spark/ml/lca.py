"""Latent Class Analysis: multinomial-mixture EM over DataFrames.

The reference runs R's poLCA for all-categorical inputs (reference:
src/kraken/app/lca.R:13-52 — k in 3..8, nrep random restarts, min-BIC
pick) and depmixS4's ``mix`` for MIXED numeric+categorical inputs
(lca.R:54-101: independent mixture with multinomial factors for
categoricals and gaussian mean/variance factors for numerics, k in
2..8, min BIC — dispatched at clustering.py:862-867 when the feature
set is the kprototypes kind). Both are invoked via rpy2 from
clustering.py:834-904. There is no JVM/MLlib equivalent; this module
implements both models — a finite mixture of independent per-column
factors — as an EM loop where each step is a Spark plan:

- **E-step** (map-only, no shuffle): per class c the row
  log-likelihood  log pi_c + sum_col log theta(c, col, x_col)  is a
  column expression built from broadcast `F.create_map` literals
  (theta is small: classes x cols x answer-options). Responsibilities
  via a numerically-stable log-sum-exp column.
- **M-step** (ONE shuffle): melt the categorical columns keeping the k
  responsibility columns, then groupBy(variable, value) sums each
  class's responsibility mass; collect the (small) table and rebuild
  theta with Laplace smoothing. pi = mean responsibility.
- **Converge**: stop when the total log-likelihood improves < tol.
- **Restarts/selection**: `lca_select` refits over k in 3..8 x nrep
  seeded random initializations and keeps the min-BIC model
  (poLCA semantics). BIC = -2 logL + p ln n with
  p = (k-1) + k * sum_col(|values_col| - 1).

Documented delta: poLCA's EM + Newton-Raphson hybrid and R's RNG are
not reproducible bit-for-bit; tests assert model recovery on planted
mixtures (ARI) and BIC monotonicity, not label identity (SURVEY §7).

Scale notes (100 TB design): per EM iteration exactly one map-side
combined shuffle whose output is |cols| x |values| rows — independent
of row count; everything row-wise is whole-stage-codegen'd column
arithmetic. Driver holds only theta (KB).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.ml.features import build_code_maps
from qudo_etl_pipeline_spark.plans.melt import melt


def _log_theta_col(col: str, table: dict[str, float], floor: float) -> Column:
    entries = []
    for v, p in table.items():
        entries += [F.lit(v), F.lit(math.log(max(p, floor)))]
    m = F.create_map(*entries)
    return F.coalesce(
        m[F.col(col).cast("string")], F.lit(math.log(floor))
    )


_VAR_FLOOR = 1e-6
_LOG_2PI = math.log(2.0 * math.pi)


def _gauss_logpdf(col: str, mu: float, var: float) -> Column:
    """Per-row gaussian log-density as a column expression."""
    v = max(var, _VAR_FLOOR)
    x = F.col(col).cast("double")
    return (
        F.lit(-0.5 * (_LOG_2PI + math.log(v)))
        - (x - F.lit(mu)) * (x - F.lit(mu)) / F.lit(2.0 * v)
    )


def lca_fit(
    df: DataFrame,
    cols: list[str],
    k: int,
    seed: int = 42,
    max_iter: int = 60,
    tol: float = 1e-4,
    smoothing: float = 1e-3,
    num_cols: list[str] | None = None,
) -> dict:
    """One EM run. Returns dict(labels, pi, theta, loglik, bic, aic,
    n_params, n_iter[, mu, var]).

    With ``num_cols`` this is the reference's MIXED-type branch
    (depmixS4 ``mix``, reference lca.R:54-101, dispatched when the
    feature set has numeric columns — clustering.py:862-867): an
    independent mixture whose per-class factors are multinomials for
    ``cols`` and gaussians (per-class mean/variance) for ``num_cols``.
    The gaussian sufficient statistics (sum r*x, sum r*x^2 per class)
    ride the SAME single M-step aggregation as the class masses, so the
    mixed model adds zero shuffles over the categorical one.
    """
    floor = 1e-12
    num_cols = list(num_cols or [])
    if not cols and not num_cols:
        raise ValueError("lca_fit: no columns to model")
    values = (
        {c: sorted(m) for c, m in build_code_maps(df, cols).items()}
        if cols
        else {}
    )
    n = df.count()
    rng = np.random.default_rng(seed)
    pi = [1.0 / k] * k
    theta: list[dict[str, dict[str, float]]] = []
    for _ in range(k):
        cls = {}
        for c in cols:
            raw = rng.random(len(values[c])) + 0.5
            raw /= raw.sum()
            cls[c] = {v: float(p) for v, p in zip(values[c], raw)}
        theta.append(cls)

    # gaussian init: class means spread over the per-column quantiles
    # (one map-side-combined pass; k x |num_cols| driver-side floats).
    # Quantile spread beats mean-jitter for well-separated components —
    # two inits in one basin is a local optimum EM cannot escape.
    mu: list[dict[str, float]] = [{} for _ in range(k)]
    var: list[dict[str, float]] = [{} for _ in range(k)]
    if num_cols:
        probs = [(2 * i + 1) / (2 * k) for i in range(k)]
        g = df.agg(
            *[
                F.var_pop(F.col(c).cast("double")).alias(f"v_{c}")
                for c in num_cols
            ],
            *[
                F.percentile_approx(
                    F.col(c).cast("double"), probs, 10000
                ).alias(f"q_{c}")
                for c in num_cols
            ],
        ).collect()[0]
        for c in num_cols:
            g_var = max(float(g[f"v_{c}"] or 1.0), _VAR_FLOOR)
            quants = g[f"q_{c}"] or [0.0] * k
            jitter = 0.1 * math.sqrt(g_var)
            for c_i in range(k):
                mu[c_i][c] = float(quants[c_i]) + float(rng.normal()) * jitter
                var[c_i][c] = g_var

    df = df.cache()
    loglik = -math.inf
    n_iter = 0
    try:
        for it in range(max_iter):
            n_iter = it + 1
            # E-step: log joint per class as column expressions
            logp = []
            for c_i in range(k):
                expr = F.lit(math.log(max(pi[c_i], floor)))
                for c in cols:
                    expr = expr + _log_theta_col(c, theta[c_i][c], floor)
                for c in num_cols:
                    expr = expr + _gauss_logpdf(c, mu[c_i][c], var[c_i][c])
                logp.append(expr.alias(f"_lp{c_i}"))
            scored = df.select("*", *logp)
            mx = F.greatest(*[F.col(f"_lp{i}") for i in range(k)])
            lse = mx + F.log(
                sum(
                    (F.exp(F.col(f"_lp{i}") - mx) for i in range(1, k)),
                    F.exp(F.col("_lp0") - mx),
                )
            )
            resp = scored.select(
                "*",
                *[
                    F.exp(F.col(f"_lp{i}") - lse).alias(f"_r{i}")
                    for i in range(k)
                ],
                lse.alias("_ll"),
            ).cache()

            # M-step: one shuffle for all theta counts; the gaussian
            # sufficient statistics ride the same aggregate
            num_sums = []
            for i in range(k):
                for c in num_cols:
                    x = F.col(c).cast("double")
                    num_sums.append(
                        F.sum(F.col(f"_r{i}") * x).alias(f"sx_{i}_{c}")
                    )
                    num_sums.append(
                        F.sum(F.col(f"_r{i}") * x * x).alias(f"sxx_{i}_{c}")
                    )
            agg_row = resp.agg(
                F.sum("_ll").alias("ll"),
                *[F.sum(f"_r{i}").alias(f"n{i}") for i in range(k)],
                *num_sums,
            ).collect()[0]
            new_ll = agg_row["ll"]
            class_mass = [agg_row[f"n{i}"] for i in range(k)]
            for c_i in range(k):
                m = max(class_mass[c_i], floor)
                for c in num_cols:
                    new_mu = agg_row[f"sx_{c_i}_{c}"] / m
                    mu[c_i][c] = new_mu
                    var[c_i][c] = max(
                        agg_row[f"sxx_{c_i}_{c}"] / m - new_mu * new_mu,
                        _VAR_FLOOR,
                    )
            if cols:
                long = melt(
                    resp.select(*[f"_r{i}" for i in range(k)], *cols),
                    id_vars=[f"_r{i}" for i in range(k)],
                    value_vars=cols,
                )
                cell_rows = (
                    long.groupBy("variable", "value")
                    .agg(*[F.sum(f"_r{i}").alias(f"m{i}") for i in range(k)])
                    .collect()
                )
            else:  # pure-gaussian mixture: no multinomial factors
                cell_rows = []
            resp.unpersist()
            pi = [m / n for m in class_mass]
            mass: dict[tuple[int, str, str], float] = {}
            for r in cell_rows:
                for c_i in range(k):
                    mass[(c_i, r["variable"], str(r["value"]))] = r[f"m{c_i}"]
            for c_i in range(k):
                for c in cols:
                    denom = class_mass[c_i] + smoothing * len(values[c])
                    theta[c_i][c] = {
                        v: (mass.get((c_i, c, v), 0.0) + smoothing) / denom
                        for v in values[c]
                    }
            if new_ll - loglik < tol and it > 0:
                loglik = new_ll
                break
            loglik = new_ll

        # Final E-step under the post-M-step parameters: labels AND the
        # reported log-likelihood come from the SAME parameter set, so the
        # BIC/AIC used by lca_select matches the returned model (the loop's
        # running loglik is measured under the pre-update parameters).
        logp = []
        for c_i in range(k):
            expr = F.lit(math.log(max(pi[c_i], floor)))
            for c in cols:
                expr = expr + _log_theta_col(c, theta[c_i][c], floor)
            for c in num_cols:
                expr = expr + _gauss_logpdf(c, mu[c_i][c], var[c_i][c])
            logp.append(expr.alias(f"_lp{c_i}"))
        scored = df.select("*", *logp)
        mx = F.greatest(*[F.col(f"_lp{i}") for i in range(k)])
        lse = mx + F.log(
            sum(
                (F.exp(F.col(f"_lp{i}") - mx) for i in range(1, k)),
                F.exp(F.col("_lp0") - mx),
            )
        )
        loglik = scored.agg(F.sum(lse).alias("ll")).collect()[0]["ll"]
        pred = F.lit(0)
        best = F.col("_lp0")
        for i in range(1, k):
            pred = F.when(F.col(f"_lp{i}") > best, i).otherwise(pred)
            best = F.greatest(best, F.col(f"_lp{i}"))
        labels = scored.withColumn("prediction", pred).drop(
            *[f"_lp{i}" for i in range(k)]
        )
        # gaussian factors add (mean, variance) per class per column
        n_params = (
            (k - 1)
            + k * sum(len(values[c]) - 1 for c in cols)
            + k * 2 * len(num_cols)
        )
        bic = -2 * loglik + n_params * math.log(n)
        aic = -2 * loglik + 2 * n_params
        return {
            "labels": labels,
            "pi": pi,
            "theta": theta,
            "mu": mu,
            "var": var,
            "loglik": loglik,
            "bic": bic,
            "aic": aic,
            "n_params": n_params,
            "n_iter": n_iter,
            "k": k,
            "seed": seed,
        }
    finally:
        df.unpersist()


def lca_select(
    df: DataFrame,
    cols: list[str],
    ks: list[int] | None = None,
    n_rep: int = 3,
    seed: int = 42,
    max_iter: int = 60,
    num_cols: list[str] | None = None,
) -> dict:
    """poLCA-style selection (lca.R:13-52): refit over k x restarts,
    keep the minimum-BIC model. n_rep is a scaled-down nrep=100.

    With ``num_cols`` this is the mixed-type dispatch: the reference's
    depmixS4 branch scans k in 2..8 and keeps the min-BIC mixture
    (lca.R:90-99); pass ``ks=list(range(2, 9))`` for exact parity."""
    ks = ks or list(range(3, 9))
    best = None
    for k in ks:
        for rep in range(n_rep):
            fit = lca_fit(
                df, cols, k, seed=seed + rep, max_iter=max_iter,
                num_cols=num_cols,
            )
            if best is None or fit["bic"] < best["bic"]:
                best = fit
    return best
