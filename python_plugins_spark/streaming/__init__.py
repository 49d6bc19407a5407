from python_plugins_spark.streaming.ops import (
    read_stream_parquet,
    run_to_memory_sink,
    session_window_agg,
    split_ports_foreach_batch,
    stateful_max_tracker,
    stateful_topn_tracker,
    stateful_running_agg,
    streaming_python_transform,
    tumbling_window_agg,
)

__all__ = [
    "read_stream_parquet",
    "run_to_memory_sink",
    "session_window_agg",
    "split_ports_foreach_batch",
    "stateful_max_tracker",
    "stateful_topn_tracker",
    "stateful_running_agg",
    "streaming_python_transform",
    "tumbling_window_agg",
]
