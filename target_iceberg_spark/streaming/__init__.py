"""Structured Streaming pipelines (windows, watermark, stream sinks)."""
