"""ML layer: feature pipeline, clustering algorithms, cluster-quality metrics.

Spark-first re-expression of the reference's clustering.py / metrics.py
(sklearn/kmodes/R) compute core. MLlib estimators where one exists;
DataFrame aggregations for every quality metric (no sklearn at runtime).
"""
