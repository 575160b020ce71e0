from palletjack_spark.streaming.ops import (
    events_stream,
    run_stream_to_table,
    tumbling_counts,
    sliding_counts,
    session_agg,
    watermarked_append_counts,
    dedup_within_watermark,
    stream_static_join,
)

__all__ = [
    "events_stream",
    "run_stream_to_table",
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "watermarked_append_counts",
    "dedup_within_watermark",
    "stream_static_join",
]
