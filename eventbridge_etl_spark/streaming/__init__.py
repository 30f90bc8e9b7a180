"""Structured Streaming pipelines — populated in P3."""
