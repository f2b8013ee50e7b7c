"""Structured Streaming variants (SURVEY §2.9 / §2.11 streaming tier)."""

from hfp_loader_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    run_available_now,
    session_window_counts,
    sliding_window_counts,
    tumbling_window_counts,
    watermark_dedup,
)
