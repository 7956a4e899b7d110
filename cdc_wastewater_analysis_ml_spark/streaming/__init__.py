from .ops import (
    read_events_stream,
    stream_conditional_rate,
    stream_lag_per_key,
    stream_lag_per_key_event_time,
    stream_lag_per_key_reordered,
    stream_session_windows,
    stream_weekly_mean,
)

__all__ = [
    "read_events_stream",
    "stream_conditional_rate",
    "stream_lag_per_key",
    "stream_lag_per_key_event_time",
    "stream_lag_per_key_reordered",
    "stream_session_windows",
    "stream_weekly_mean",
]
