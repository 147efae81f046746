"""qudo_etl_pipeline_spark — a PySpark-native analytics engine.

Brand-new implementation of the query/data-processing capabilities of the
reference survey-segmentation pipeline ``sigamani/qudo-ETL-pipeline``
(read-only checkout at /root/reference), re-expressed Spark-first:

- ``sources``   — Parquet/CSV/JSON readers & writers, work-queue state
- ``operators`` — cleaning, contingency/chi-squared inference, dedup,
                  similarity search, text analysis, multimodal plumbing
- ``functions`` — scalar/statistical helpers (chi2 sf, cross-engine hash)
- ``plans``     — reusable logical-plan builders (melt, densified grids)
- ``ml``        — clustering algorithms + model selection + quality metrics
- ``streaming`` — Structured Streaming ingestion of event tables

Design principles (see SURVEY.md):
- declarative DataFrame/SQL everywhere; Catalyst does pushdown/pruning
- ONE wide->long shuffle powers all contingency statistics (SURVEY §3.3)
- UDFs only where built-ins can't express the op, always Arrow-vectorized
"""

__version__ = "0.1.0"
