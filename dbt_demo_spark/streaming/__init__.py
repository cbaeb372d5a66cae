from .dedup import streaming_first_seen
from .rollup import read_event_stream, session_rollup, streaming_hourly_rollup

__all__ = ["read_event_stream", "session_rollup", "streaming_first_seen",
           "streaming_hourly_rollup"]
