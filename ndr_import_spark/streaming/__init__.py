from ndr_import_spark.streaming.pipeline import (
    session_window_stats,
    stateful_stream_dedup,
    stream_cluster_assign,
    stream_cms_cells,
    stream_phrase_flags,
    stream_decontaminate,
    stream_records,
    stream_tables,
    stream_c4_filter,
    stream_media_metadata,
    stream_warc_ingest,
    windowed_stats,
)

__all__ = [
    "stream_tables",
    "stream_records",
    "windowed_stats",
    "session_window_stats",
    "stateful_stream_dedup",
    "stream_cluster_assign",
    "stream_cms_cells",
    "stream_phrase_flags",
    "stream_decontaminate",
    "stream_warc_ingest",
    "stream_media_metadata",
    "stream_c4_filter",
]
