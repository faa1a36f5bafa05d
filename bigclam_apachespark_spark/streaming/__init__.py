from bigclam_apachespark_spark.streaming.events_stream import (
    read_events_stream,
    windowed_counts_stream,
    sessionize_stream,
    run_stream_to_memory,
)

__all__ = [
    "read_events_stream",
    "windowed_counts_stream",
    "sessionize_stream",
    "run_stream_to_memory",
]
