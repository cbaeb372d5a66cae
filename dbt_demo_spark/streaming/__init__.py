from .dedup import (streaming_dedup_within_watermark, streaming_first_seen,
                    streaming_first_seen_ttl)
from .rollup import read_event_stream, session_rollup, streaming_hourly_rollup

__all__ = ["read_event_stream", "session_rollup",
           "streaming_dedup_within_watermark", "streaming_first_seen",
           "streaming_first_seen_ttl", "streaming_hourly_rollup"]
