"""Structured Streaming helpers: windowed aggregation, sessionization, stateful dedup."""
