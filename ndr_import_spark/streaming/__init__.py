from ndr_import_spark.streaming.pipeline import (
    session_window_stats,
    stream_records,
    stream_tables,
    windowed_stats,
)

__all__ = [
    "stream_tables",
    "stream_records",
    "windowed_stats",
    "session_window_stats",
]
