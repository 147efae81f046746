from qudo_etl_pipeline_spark.plans.melt import melt

__all__ = ["melt"]
