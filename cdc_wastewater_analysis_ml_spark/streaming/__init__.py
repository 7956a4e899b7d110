from .ingest import stream_incremental_ingest
from .lines import merged_store, stream_line_dedup
from .neardup import read_docs_stream, stream_dedup_incremental_near
from .ops import (
    read_events_stream,
    stream_conditional_rate,
    stream_dedup_exact,
    stream_dedup_within_watermark,
    stream_enrich_static,
    stream_interval_join,
    stream_lag_per_key,
    stream_lag_per_key_event_time,
    stream_lag_per_key_reordered,
    stream_session_windows,
    stream_sink_parquet,
    stream_weekly_mean,
)

__all__ = [
    "merged_store",
    "read_docs_stream",
    "read_events_stream",
    "stream_conditional_rate",
    "stream_dedup_exact",
    "stream_dedup_incremental_near",
    "stream_dedup_within_watermark",
    "stream_enrich_static",
    "stream_incremental_ingest",
    "stream_interval_join",
    "stream_lag_per_key",
    "stream_lag_per_key_event_time",
    "stream_lag_per_key_reordered",
    "stream_line_dedup",
    "stream_session_windows",
    "stream_sink_parquet",
    "stream_weekly_mean",
]
