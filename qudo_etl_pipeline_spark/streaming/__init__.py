from qudo_etl_pipeline_spark.streaming.sessions import (
    running_user_counts_stream,
    session_window_counts,
)

__all__ = ["running_user_counts_stream", "session_window_counts"]
