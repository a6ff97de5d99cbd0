from elastic_surv_spark.streaming.windows import (  # noqa: F401
    hourly_counts_stream,
    read_events_stream,
    session_window_stream,
    sliding_counts_stream,
)
