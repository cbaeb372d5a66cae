from .dedup import (streaming_dedup_within_watermark, streaming_first_seen,
                    streaming_first_seen_ttl)
from .heavy import streaming_heavy_hitter_sketch
from .ingest import clean_ingest, ingest_batch, read_document_stream
from .join import interval_join
from .locf import streaming_locf
from .spine import streaming_daily_spine
from .rollup import read_event_stream, session_rollup, streaming_hourly_rollup
from .sink import rollup_to_warehouse, stream_static_enrich
from .upsert import lww_upsert_batch, lww_view, spine_lww_view

__all__ = ["clean_ingest", "ingest_batch", "interval_join", "read_document_stream", "read_event_stream", "rollup_to_warehouse",
           "session_rollup", "stream_static_enrich",
           "streaming_dedup_within_watermark", "streaming_first_seen",
           "streaming_first_seen_ttl", "streaming_heavy_hitter_sketch",
           "streaming_locf", "streaming_daily_spine",
           "streaming_hourly_rollup"]
