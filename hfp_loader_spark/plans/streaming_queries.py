"""streaming_queries query catalog (filled in this round)."""
