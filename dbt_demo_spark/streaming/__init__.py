from .dedup import (streaming_dedup_within_watermark, streaming_first_seen,
                    streaming_first_seen_ttl)
from .join import interval_join
from .rollup import read_event_stream, session_rollup, streaming_hourly_rollup
from .sink import rollup_to_warehouse, stream_static_enrich

__all__ = ["interval_join", "read_event_stream", "rollup_to_warehouse",
           "session_rollup", "stream_static_enrich",
           "streaming_dedup_within_watermark", "streaming_first_seen",
           "streaming_first_seen_ttl", "streaming_hourly_rollup"]
